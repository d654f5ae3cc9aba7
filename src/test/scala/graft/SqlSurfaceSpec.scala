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
}
