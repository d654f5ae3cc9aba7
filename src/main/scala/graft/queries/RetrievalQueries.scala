package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{Embeddings, Retrieval}

/** Registered retrieval queries: BM25 lexical top-k and the
  * lexical + embedding reciprocal-rank-fusion hybrid — both fully
  * oracled (BM25 is pure relational arithmetic + ln, and the fusion arm
  * ranks are themselves oracled constructions).
  */
object RetrievalQueries {

  private val QueryTerms = Seq("vector", "merge", "window")
  private val K1 = "1.2"
  private val B = "0.75"
  private val HybridProbe = 7L
  private val ArmK = 50
  private val FusedK = 20

  /** BM25 top-10 for a fixed 3-term query ([[Retrieval.bm25TopK]]).
    * Every float step is either exact rational arithmetic replayed
    * verbatim by the oracle or the ln-idf, which follows the
    * q_tfidf_terms round-before-rank discipline.
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Retrieval.bm25TopK(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text",
      QueryTerms, k1 = 1.2, b = 0.75, k = 10)
      .orderBy($"rk")
  }

  /** [[bm25]] through the PERSISTENT index ([[Retrieval.buildIndex]] /
    * [[Retrieval.queryIndex]]): the query touches only its terms'
    * posting buckets, never the corpus. Registered against the SAME
    * oracle SQL as q_bm25 — the index must change cost only, never the
    * answer (the q_near_dup_pairs_capped / q_topk_bounded discipline).
    * The build runs inside the query here (the registered surface has
    * no cross-query state); a serving deployment builds once.
    */
  /** One index build per (corpus dir, JVM) — the [[Embeddings]]
    * nlist-count-cache discipline: the registered query's STEADY state
    * measures the serving cost (probe the stored index), its cold run
    * the build, which is exactly the operator's declared lifecycle.
    * Bounded: one entry per testdata dir ever seen in a session.
    */
  private val bm25IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def bm25Indexed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = bm25IndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("bm25idx").toString
      Retrieval.buildIndex(
        Tables.wide(spark, dir, "documents"), $"doc_id", $"text", p, buckets = 16)
      p
    })
    Retrieval.queryIndex(spark, path, QueryTerms, k1 = 1.2, b = 0.75, k = 10)
      .orderBy($"rk")
  }

  /** Hybrid retrieval: BM25 arm (top-[[ArmK]]) fused with the
    * 50-nearest-neighbor arm of embedding [[HybridProbe]] by reciprocal
    * rank fusion ([[Retrieval.reciprocalRankFusion]], rrfK=60) — the
    * standard RAG first stage. doc_id and vec_id share the corpus id
    * space (TESTDATA.md), so the arms fuse on doc_id directly. The
    * lexical arm may rank the probe document itself (the vector arm
    * excludes self-matches by the knn contract); both engines apply the
    * same rule.
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lex = Retrieval.bm25TopK(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text",
      QueryTerms, k1 = 1.2, b = 0.75, k = ArmK)
      .select($"doc_id", $"rk")
    val e = Tables.wide(spark, dir, "embeddings")
    val vec = Embeddings.knnBruteForce(
      e, $"vec_id", $"embedding",
      e.filter($"vec_id" === HybridProbe), $"vec_id", $"embedding", k = ArmK)
      .select($"neighbor_id".as("doc_id"), $"rk")
    Retrieval.reciprocalRankFusion(Seq(lex, vec), rrfK = 60, k = FusedK)
      .orderBy($"rk")
  }

  /** The BM25 chain as CTEs ending in `lex(doc_id, bm25, rk)` — shared
    * by the standalone oracle and the hybrid's lexical arm. Constants
    * are spelled as the SAME arithmetic the Scala side performs
    * (`($K1) + 1.0`, `1.0 - ($B)`) so both engines derive identical
    * doubles instead of parsing pre-folded literals.
    */
  private def bm25Cte(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      s"max(CASE WHEN term = '$t' THEN c END) AS c$i"
    }.mkString(",\n    ")
    val sum = terms.indices.map(i => s"coalesce(c$i, 0.0)").mkString(" + ")
    s"""base AS (
       |  SELECT doc_id,
       |    regexp_extract_all(lower(text), '${Retrieval.TermRegex}') AS toks
       |  FROM documents),
       |dl AS (SELECT doc_id, len(toks) AS dl FROM base),
       |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM base)
       |  WHERE term IN ($inList) GROUP BY doc_id, term),
       |tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln(1.0 + (CAST(s.n AS DOUBLE) - CAST(tdf.df AS DOUBLE) + 0.5) /
       |              (CAST(tdf.df AS DOUBLE) + 0.5))
       |      * (CAST(tf.tf AS DOUBLE) * (($K1) + 1.0)) /
       |      (CAST(tf.tf AS DOUBLE) + ($K1) * (1.0 - ($B) + ($B) *
       |        CAST(dl.dl AS DOUBLE) / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))) AS c
       |  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s),
       |pivoted AS (
       |  SELECT doc_id,
       |    $pivots
       |  FROM contrib GROUP BY doc_id),
       |lexscored AS (SELECT doc_id, round($sum, 6) AS bm25 FROM pivoted),
       |lex AS (
       |  SELECT doc_id, bm25, rk FROM (
       |    SELECT doc_id, bm25,
       |      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk
       |    FROM lexscored)
       |  WHERE rk <= $k)""".stripMargin
  }

  private[queries] val bm25Sql: String =
    s"""WITH ${bm25Cte(QueryTerms, 10)}
       |SELECT rk, doc_id, bm25 FROM lex ORDER BY rk""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a)+1)])"

  private[queries] val hybridRrfSql: String = {
    val dotPC = dotSql("p.pe", "e.embedding")
    val normP = s"sqrt(${dotSql("p.pe", "p.pe")})"
    val normC = s"sqrt(${dotSql("e.embedding", "e.embedding")})"
    s"""WITH ${bm25Cte(QueryTerms, ArmK)},
       |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = $HybridProbe),
       |knnscored AS (
       |  SELECT e.vec_id AS doc_id,
       |    round(coalesce($dotPC / nullif($normP * $normC, 0.0), 0.0), 4) AS cosine
       |  FROM embeddings e CROSS JOIN probe p
       |  WHERE e.vec_id <> $HybridProbe),
       |knn AS (
       |  SELECT doc_id, rk FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY cosine DESC, doc_id) AS rk
       |    FROM knnscored)
       |  WHERE rk <= $ArmK),
       |fused AS (
       |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    round(coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(l.rk AS DOUBLE)), 0.0) +
       |          coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(v.rk AS DOUBLE)), 0.0), 6) AS rrf
       |  FROM lex l FULL OUTER JOIN knn v ON l.doc_id = v.doc_id)
       |SELECT rk, doc_id, rrf FROM (
       |  SELECT doc_id, rrf,
       |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk
       |  FROM fused)
       |WHERE rk <= $FusedK ORDER BY rk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (bm25 _),
    "q_bm25_indexed" -> (bm25Indexed _),
    "q_hybrid_rrf" -> (hybridRrf _))

  val oracles: Map[String, String] = Map(
    "q_bm25" -> bm25Sql,
    "q_bm25_indexed" -> bm25Sql,
    "q_hybrid_rrf" -> hybridRrfSql)
}
