package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Binary-column (multimodal) queries. The testdata has no real media
  * table, so payloads are synthesized deterministically (UTF-8 bytes of
  * the document text) — the OPERATORS under test (binary size, checksum,
  * digest aggregation) are the real multimodal surface; only the payload
  * provenance is synthetic.
  */
object MultimodalQueries {

  /** Per-source payload statistics over a binary column: row counts, byte
    * volumes, and a deterministic content digest (min md5) — the
    * shape of a media-lake audit query, no decode anywhere.
    */
  def binaryStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"source", encode($"text", "UTF-8").as("payload"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        sum(Multimodal.payloadSize($"payload")).cast("long").as("total_bytes"),
        max(Multimodal.payloadSize($"payload")).cast("int").as("max_bytes"),
        min(md5($"payload")).as("min_md5"))
      .orderBy($"source")
  }

  // DuckDB md5(varchar) hashes the string's UTF-8 bytes — exactly the
  // payload Spark hashes after encode(text, 'UTF-8').
  val binaryStatsSql: String =
    """SELECT source, count(*) AS n,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(max(octet_length(encode(text))) AS INT) AS max_bytes,
      |  min(md5(text)) AS min_md5
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binary_stats" -> (binaryStats _))

  val oracles: Map[String, String] = Map(
    "q_binary_stats" -> binaryStatsSql)
}
