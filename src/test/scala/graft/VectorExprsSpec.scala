package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DotFExpr, HammingDistExpr, SparseSignSketchExpr}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Embeddings

/** The native vector expressions must be drop-in replacements for the
  * higher-order-function formulations they displaced — [[DotFExpr]] sits
  * inside oracle-HASH-matched queries (q_embedding_knn, q_label_cohesion),
  * so parity is bit-level, not approximate.
  */
class VectorExprsSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** The displaced HOF fold, verbatim from the round-4 Embeddings.dot. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  private val floatGen: Gen[Float] = Gen.oneOf(
    Gen.choose(-10f, 10f),
    Gen.oneOf(0f, -0f, 1e-30f, 1e30f, Float.MaxValue, Float.MinPositiveValue))

  test("dot_f is bit-identical to the zip_with/aggregate fold (floats, both orders)") {
    import spark.implicits._
    val vecGen = Gen.choose(0, 70).flatMap(n => Gen.listOfN(n, floatGen))
    val pairs = samples(Gen.zip(vecGen, vecGen), 60) ++
      // equal-length pairs (the common case; the generator above mostly
      // produces mismatches, which both sides must agree are null)
      samples(Gen.choose(0, 70).flatMap(n =>
        Gen.zip(Gen.listOfN(n, floatGen), Gen.listOfN(n, floatGen))), 60)
    val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
    val got = df.select(
      Embeddings.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      val n = if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
      val h = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      if (n == null || h == null) {
        assert(n == null && h == null, s"null surface diverged: native=$n hof=$h")
      } else {
        assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
          s"bit divergence: native=$n hof=$h")
      }
    }
  }

  /** (a, b) rows with nullable float elements, via explicit schema (no
    * boxed-array encoder in implicits).
    */
  private def nullableVecDf(rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
  }

  test("dot_f matches the fold on null elements and double-typed literals") {
    import spark.implicits._
    val df = nullableVecDf(Seq(
      (Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)),
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f, 2f)),
      (null, Seq[java.lang.Float](1f, 2f))))
    val got = df.select(
      Embeddings.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1)) }
    assert(got(0).isNullAt(0) && got(2).isNullAt(0))
    assert(got(1).getDouble(0) == 5.0)
    // float column x double literal (the hyperplane/centroid shape)
    val plane = Array(0.5, -0.25)
    val mixed = Seq(Array(2f, 4f)).toDF("a")
      .select(Embeddings.dot(col("a"), lit(plane))).as[Double].head()
    assert(mixed == 2 * 0.5 - 4 * 0.25)
  }

  test("dot_f SQL surface: registered, codegen'd, wrong-arity raises the standard error") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    df.createOrReplaceTempView("vex_t")
    assert(spark.sql("SELECT dot_f(a, b) FROM vex_t").as[Double].head() == 11.0)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_f(a) FROM vex_t").collect()
    }
    assert(e.getMessage.contains("dot_f"))
    // stays inside the whole-stage codegen span (the point of the
    // rewrite) — over a parquet scan: a local relation would be
    // constant-folded away before reaching the executed plan
    val q = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Embeddings.dot(col("embedding"), col("embedding")).as("d"))
    q.collect()
    val line = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("dot_f")).getOrElse("")
    assert(line.trim.matches(".*\\*\\(\\d+\\).*"), s"dot_f fell out of codegen: $line")
  }

  test("hamming_dist counts xor popcount and throws on word-count mismatch") {
    import spark.implicits._
    val df = Seq(
      (Array(0L, 0L), Array(0L, 0L), 0),
      (Array(-1L, 0L), Array(0L, 0L), 64),
      (Array(0xFFL, 1L << 63), Array(0L, 0L), 9),
      (Array(0b1010L), Array(0b0110L), 2))
      .toDF("a", "b", "want")
    df.select(HammingDistExpr.hamming(col("a"), col("b")) === col("want"))
      .collect().foreach(r => assert(r.getBoolean(0)))
    val bad = Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(HammingDistExpr.hamming(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("hamming_dist")))
  }

  test("sparse sign sketch matches a driver-side reference and is plan-deterministic") {
    import spark.implicits._
    val dim = 16; val h = 40; val s = 4
    val (idx, sgn) = Embeddings.sparsePlanes(dim, h, s, seed = 7L)
    assert(idx.size == h && idx.forall(p => p.size == s && p.distinct.size == s))
    val vecGen = Gen.listOfN(dim, floatGen)
    val vecs = samples(vecGen, 30).map(_.toArray)
    def ref(v: Array[Float]): Seq[Long] = {
      val words = new Array[Long]((h + 63) / 64)
      for (j <- 0 until h) {
        val acc = (0 until s).map(t => sgn(j)(t) * v(idx(j)(t)).toDouble).sum
        if (acc >= 0) words(j >> 6) |= 1L << (j & 63)
      }
      words.toSeq
    }
    val got = vecs.toSeq.toDF("v")
      .select(SparseSignSketchExpr.sketch(col("v"), idx, sgn))
      .collect().map(_.getSeq[Long](0))
    vecs.zip(got).foreach { case (v, g) =>
      // both sides sum the same s terms in the same order — exact equality
      assert(g == ref(v), s"sketch mismatch for ${v.mkString(",")}")
    }
  }

  test("sparse sign sketch throws loudly on narrow or null-element vectors") {
    import spark.implicits._
    val (idx, sgn) = Embeddings.sparsePlanes(64, 8, 4, seed = 7L)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val narrow = Seq(Array.fill(8)(1f)).toDF("v")
    val e1 = intercept[Exception] {
      narrow.select(SparseSignSketchExpr.sketch(col("v"), idx, sgn)).collect()
    }
    assert(msgs(e1).exists(_.contains("sparse_sign_sketch")))
    val nullElem = nullableVecDf(Seq(
      (Seq.fill[java.lang.Float](64)(null), Seq[java.lang.Float](1f))))
    val e2 = intercept[Exception] {
      nullElem.select(SparseSignSketchExpr.sketch(col("a"), idx, sgn)).collect()
    }
    assert(msgs(e2).exists(_.contains("sparse_sign_sketch")))
    // a null VECTOR row is null-intolerant null, not an error
    val nullRow = nullableVecDf(Seq(
      (null, Seq[java.lang.Float](1f)),
      (Seq.fill[java.lang.Float](64)(1f), Seq[java.lang.Float](1f))))
    val out = nullRow.select(SparseSignSketchExpr.sketch(col("a"), idx, sgn)).collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
