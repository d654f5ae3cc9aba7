package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(_ => ("hot", 1)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dim")
    val plain = big.join(small, Seq("key")).groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"dim").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedJoin(big, small, "key", n = 8).groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"dim").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    // left join keeps unmatched rows exactly once per big row
    val plainLeft = big.join(small, Seq("key"), "left").count()
    val saltedLeft = ScaleOps.saltedJoin(big, small, "key", 8, "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i % 97, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i % 89, s"b$i")).toDF("k", "vb")
    // a previous JVM's managed-table directories survive in the warehouse
    // while the in-memory catalog starts empty — clear both sides
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    ScaleOps.writeBucketed(a, "bucketed_a", "k", buckets = 8)
    ScaleOps.writeBucketed(b, "bucketed_b", "k", buckets = 8)
    // disable broadcast so the join must pick SMJ; bucketing then removes
    // both shuffles
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      assert(!ScaleOps.hasShuffleExchange(joined))
      assert(joined.count() > 0)
      // sanity: the same join over unbucketed data DOES shuffle
      assert(ScaleOps.hasShuffleExchange(a.join(b, "k")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
