package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-level duplicate-SPAN detection — the "exact substring dedup"
  * of Lee et al., ''Deduplicating Training Data Makes Language Models
  * Better'' (ACL 2022), re-expressed relationally: a position is
  * duplicated when its k-char gram occurs in at least two distinct
  * documents. Word- and paragraph-grain dedup (Dedup / Curation) miss
  * these: a 300-char boilerplate footer pasted mid-sentence into
  * otherwise-distinct pages is invisible to whole-doc keys and shingle
  * Jaccard below threshold, but every one of its positions lights up
  * here.
  *
  * Scale shape (the suffix-array build of the paper is replaced by
  * grouping, Spark's native strength):
  *
  *  - '''Grams never shuffle.''' Each position ships as a 128-bit
  *    composite hash (two independent xxhash64 probes) plus (doc, pos) —
  *    ~24 bytes/row regardless of k. Collision risk at the composite key
  *    is ~n²/2¹²⁹ (≈10⁻¹⁴ even at 10¹² positions); the DuckDB oracle
  *    groups by the RAW gram, so any collision would surface as a hash
  *    mismatch — none ever has.
  *  - '''Two cheap scans instead of a cache.''' The position projection
  *    is recomputed for the candidate filter and the semi-join rather
  *    than materialized — at 100 TB a narrow double-scan beats caching
  *    position-grain data ~k× the corpus size.
  *  - '''No pair join anywhere.''' A gram duplicated across m documents
  *    costs m rows, never m² — hot boilerplate grams are linear by
  *    construction (contrast: the banded dedup family needs explicit hot
  *    bucket guards).
  *  - '''Integer-exact coverage.''' Duplicated-span char coverage per doc
  *    is the union of equal-length intervals: with positions sorted,
  *    that's sum(min(k, pos - lag(pos))) with k for the first row — a
  *    pure integer window over ONLY the duplicated positions (tiny), no
  *    floats until the final display ratio.
  */
object SpanDedup {

  /** One row per position whose k-gram appears in >= 2 distinct docs:
    * (carry..., idCol, pos). `carry` columns ride the position rows
    * (keep them small — e.g. a source/partition tag).
    */
  def duplicateSpanPositions(docs: DataFrame, idCol: String, textCol: String,
      k: Int, carry: Seq[String] = Nil): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val pos = positions(docs, idCol, textCol, k, carry)
    val cand = pos.groupBy(col("h1"), col("h2"))
      .agg(countDistinct(col(idCol)).as("__cd"))
      .filter(col("__cd") >= 2)
      .select(col("h1"), col("h2"))
    pos.join(cand, Seq("h1", "h2"), "leftsemi")
      .select((carry :+ idCol :+ "pos").map(col): _*)
  }

  /** Per-document duplicated-char coverage: (carry..., idCol, n_dup_pos,
    * dup_chars). Only documents with at least one duplicated position
    * appear; the window runs over duplicated positions only.
    */
  def duplicateSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
      k: Int, carry: Seq[String] = Nil): DataFrame = {
    val hits = duplicateSpanPositions(docs, idCol, textCol, k, carry)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("__cov", coalesce(
        least(lit(k), col("pos") - lag(col("pos"), 1).over(w)), lit(k)))
      .groupBy((carry :+ idCol).map(col): _*)
      .agg(count(lit(1)).as("n_dup_pos"),
        sum(col("__cov")).cast("long").as("dup_chars"))
  }

  /** The k-gram position projection: (carry..., idCol, pos, h1, h2).
    * Docs shorter than k emit nothing. h2 salts the gram with a suffix
    * byte so the two probes are computed over distinct byte streams.
    */
  private def positions(docs: DataFrame, idCol: String, textCol: String,
      k: Int, carry: Seq[String]): DataFrame = {
    val t = col(textCol)
    val seqCol = when(length(t) >= k,
      sequence(lit(1), length(t) - k + 1)).otherwise(array().cast("array<int>"))
    docs
      .select((carry :+ idCol).map(col) :+ t.as("__t") :+ explode(seqCol).as("pos"): _*)
      .select((carry :+ idCol).map(col) :+ col("pos") :+
        xxhash64(col("__t").substr(col("pos"), lit(k))).as("h1") :+
        xxhash64(concat(col("__t").substr(col("pos"), lit(k)), lit("#"))).as("h2"): _*)
  }
}
