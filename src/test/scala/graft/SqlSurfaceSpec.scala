package graft

import org.apache.spark.sql.functions._

/** The SQL entry surface: every testdata table registers as a temp view
  * and `spark.sql` answers match the DataFrame API over the same scans.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sf)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) > 0, t)
    }
  }

  test("SQL and DataFrame answers agree on a join-aggregate") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT r_name, count(*) AS n FROM nation
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables(spark, sf, "nation")
      .join(Tables(spark, sf, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
      .orderBy(col("r_name"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
    assert(viaSql.map(_._2).sum == 25L) // all 25 nations accounted for
  }

  test("a pure-SQL curation pipeline composes from registered functions and matches the operator") {
    // the library's SQL surface must carry a whole pipeline, not just
    // scalar calls: normalize-key dedup (strip+lower fingerprint, keep
    // min doc_id per key) + quality columns, written ONLY in spark.sql
    // against registered tables and functions — then compared against
    // the operator/Column formulation of the same stages
    Tables.registerAll(spark, sf)
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """WITH keyed AS (
        |  SELECT doc_id, lang,
        |    doc_fingerprint(lower(py_strip(text))) AS k,
        |    token_count(text) AS nt,
        |    dataset_split(text) AS split
        |  FROM documents),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY doc_id) AS rn
        |  FROM keyed)
        |SELECT doc_id, lang, split, CAST(nt AS BIGINT) AS nt
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val docs = Tables(spark, sf, "documents")
    val viaOps = graft.operators.Dedup.exact(docs,
        graft.functions.TextFunctions.fingerprint(
          lower(graft.functions.TextFunctions.pyStrip(col("text")))),
        col("doc_id"), payload = Seq("doc_id", "lang", "text"))
      .select(col("doc_id"), col("lang"),
        graft.operators.Curation.splitColumn(col("text")).as("split"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(viaSql == viaOps)
    assert(viaSql.nonEmpty)
  }

  test("native partial_ratio_sim registers as a SQL function (extensions surface)") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT round(partial_ratio_sim('bandung', 'menujubandungsekarang'), 4) AS exact,
        |  round(partial_ratio_sim('bandng', 'kemarin ke bandung'), 4) AS fuzzy,
        |  partial_ratio_sim('', 'x') AS empty""".stripMargin)
      .collect().head
    assert(got.getDouble(0) == 1.0)   // embedded substring aligns exactly
    assert(got.getDouble(1) > 0.8 && got.getDouble(1) < 1.0)
    assert(got.getDouble(2) == 0.0)
    // and the builder-time extensions path wires the same function
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new org.apache.spark.sql.graft.GraftExtensions().apply(ext)
  }

  test("composed text functions register as SQL and match the Column API") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val texts = Seq(
      "Halo @user1 cek https://x.co/a #MBG  sekarang",
      "the cat is on the mat", "", "  spaced  out  ")
    import spark.implicits._
    val df = texts.toDF("t")
    val viaSql = df.selectExpr(
      "clean_tweet_text(t)", "clean_text_scraper(t)", "py_strip(t)",
      "lang_id(t)", "CAST(token_count(t) AS BIGINT)", "doc_fingerprint(t)",
      "doc_fingerprint60(t)", "dataset_split(t)")
      .collect().toSeq
    val viaDf = df.select(
      TextFunctions.cleanTweetText($"t"), TextFunctions.cleanTextScraper($"t"),
      TextFunctions.pyStrip($"t"), TextFunctions.langId($"t"),
      TextFunctions.tokenCount($"t").cast("long"), TextFunctions.fingerprint($"t"),
      TextFunctions.fingerprint60($"t"),
      graft.operators.Curation.splitColumn($"t"))
      .collect().toSeq
    assert(viaSql == viaDf)
    // simhash64 + built-in bit_count(a ^ b) compose to SQL near-dup
    // detection (hamming_dist is the ARRAY-sketch variant; a 64-bit
    // scalar fingerprint xors directly)
    val ham = spark.sql(
      """SELECT bit_count(simhash64('the quick brown fox jumps high') ^
        |                 simhash64('the quick brown fox jumps low')) AS h,
        |       bit_count(simhash64('same text') ^ simhash64('same text')) AS zero
        |""".stripMargin).collect().head
    assert(ham.getInt(1) == 0)
    assert(ham.getInt(0) > 0 && ham.getInt(0) <= 20) // near-dup: small distance
    // wrong arity surfaces the standard WRONG_NUM_ARGS AnalysisException
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT py_strip('a', 'b')").collect()
    }
    assert(e.getCondition != null && e.getCondition.contains("WRONG_NUM_ARGS"),
      s"unexpected error class: ${e.getCondition}")
  }

  test("redact_pii registers as SQL and matches the Column API") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      "mail a@b.io from 10.0.0.1 call 555-123-4567",
      "nothing sensitive").toDF("t")
    val viaSql = df.selectExpr("redact_pii(t)").collect().map(_.getString(0)).toSeq
    val viaDf = df.select(TextFunctions.redactPii($"t")).collect().map(_.getString(0)).toSeq
    assert(viaSql === viaDf)
    assert(viaSql.head === "mail [EMAIL] from [IP] call [PHONE]")
  }

  test("dhash64 registers as SQL and matches the Column API over decoded grids") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    // a decoded-grid stand-in: any 72-float array is a valid dHash input;
    // the SQL call must equal the Column expression bit for bit
    val grids = Seq(
      (1L, Array.tabulate(72)(i => (i * 37 % 23).toFloat)),
      (2L, Array.fill(72)(5f)), // flat grid: hash 0
      (3L, Array.tabulate(72)(i => if (i % 2 == 0) 1f else 9f)))
    val df = grids.toDF("id", "feat")
    df.createOrReplaceTempView("grids")
    val viaSql = spark.sql(
      "SELECT id, dhash64(feat) AS h FROM grids ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDf = df.select($"id",
        graft.operators.Multimodal.dHash64($"feat").as("h"))
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
    assert(viaSql(1)._2 == 0L) // flat image hashes to zero
  }

  test("aes_priority registers as SQL: ORDER BY DESC LIMIT k is weightedSample") {
    Tables.registerAll(spark, sf)
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT doc_id, aes_priority(doc_id, length(text), 'graft-ws') AS priority
        |FROM documents ORDER BY priority DESC, doc_id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaOp = graft.operators.Curation.weightedSample(
        Tables(spark, sf, "documents"), col("doc_id"), length(col("text")), 10)
      .orderBy(col("rk"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql == viaOp)
    assert(viaSql.size == 10)
  }

  test("chunk_passages in SQL explodes to exactly the relation operator's rows") {
    Tables.registerAll(spark, sf)
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT doc_id, c.chunk_id, c.n_tokens, c.chunk_text
        |FROM documents
        |LATERAL VIEW explode(chunk_passages(text, 40, 25)) AS c
        |ORDER BY doc_id, chunk_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    val viaOp = graft.operators.Curation.chunkPassages(
        Tables(spark, sf, "documents"), col("doc_id"), col("text"), 40, 25)
      .orderBy(col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(viaSql == viaOp)
    assert(viaSql.nonEmpty)
    // empty/null docs yield no chunks, not nulls
    val empties = spark.sql(
      "SELECT chunk_passages('', 4, 2) AS c, chunk_passages(NULL, 4, 2) AS n")
      .collect().head
    assert(empties.getSeq[Any](0).isEmpty && empties.getSeq[Any](1).isEmpty)
  }
}
