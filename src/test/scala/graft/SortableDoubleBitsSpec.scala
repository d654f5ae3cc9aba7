package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SortableDoubleBitsExpr
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[SortableDoubleBitsExpr]] underpins the r18 radix-seeded quantile
  * bracketing ([[graft.operators.Quantiles]]): its contract is (a) the
  * mapped longs carry EXACTLY the numeric order of the doubles (a
  * refinement: -0.0 one below +0.0), (b) the transform inverts bit-for-bit
  * on the driver, and (c) codegen and interpreted eval agree — all three
  * are what lets the operator replace float bucket arithmetic with integer
  * shifts without moving any order statistic.
  */
class SortableDoubleBitsSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e12, 1e12),
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
      Double.PositiveInfinity, Double.NegativeInfinity,
      42.0, -42.0, 1.0 + math.ulp(1.0)))

  test("order isomorphism: sortable(a) < sortable(b) iff a < b (with -0.0 just below +0.0)") {
    val vs = samples(doubleGen, 400).distinct
    for (a <- vs; b <- vs) {
      val sa = SortableDoubleBitsExpr.toSortable(a)
      val sb = SortableDoubleBitsExpr.toSortable(b)
      if (a < b) assert(sa < sb, s"$a < $b but $sa >= $sb")
      else if (a > b) assert(sa > sb, s"$a > $b but $sa <= $sb")
      else { // numeric ties: only -0.0 vs +0.0 may differ, ordered -0.0 first
        val zeroTie = (java.lang.Double.doubleToLongBits(a) !=
          java.lang.Double.doubleToLongBits(b))
        if (zeroTie) assert(math.abs(sa - sb) == 1L && (sa < sb) == (1.0 / a < 1.0 / b))
        else assert(sa == sb)
      }
    }
  }

  test("invert is the exact bit-level inverse") {
    samples(doubleGen, 400).foreach { v =>
      val back = SortableDoubleBitsExpr.invert(SortableDoubleBitsExpr.toSortable(v))
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(v), s"round-trip moved $v -> $back")
    }
  }

  test("codegen, interpreted eval and the driver-side kernel agree; null passes through") {
    import spark.implicits._
    val vs = samples(doubleGen, 300).map(java.lang.Double.valueOf) :+
      null.asInstanceOf[java.lang.Double]
    val df = vs.toDF("v")
    val expr = SortableDoubleBitsExpr.sortableBits(col("v"))
    val rows = df.select(col("v"), expr.as("sk")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "null input must map to null")
      else assert(r.getLong(1) == SortableDoubleBitsExpr.toSortable(r.getDouble(0)))
    }
    // sort-key use (the operator's actual consumption shape): ordering by
    // the mapped longs must be numerically non-decreasing
    val sorted = df.na.drop().orderBy(expr).as[Double].collect()
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"bit order inverted: $a then $b")
      case _ => ()
    }
  }
}
