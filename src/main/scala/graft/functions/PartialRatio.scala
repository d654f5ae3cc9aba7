package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass implementation of the windowed partial-ratio similarity
  * (see [[graft.operators.FuzzyLocator.partialRatioSim]] for the
  * semantics): align the shorter of (a, b) against every window of the
  * longer at lengths m-1 / m / m+1, score each window dist/max(m, |w|),
  * return 1 − best.
  *
  * Bit-identical to the higher-order-function formulation (the property
  * spec asserts it), but ~an order of magnitude cheaper: the HOF version
  * allocates a UTF8String per window via substr and re-runs Spark's
  * two-row levenshtein from scratch each time; this decodes each input to
  * a codepoint array ONCE (matching substr/levenshtein codepoint
  * semantics) and reuses one DP row across all windows.
  */
object PartialRatioImpl {

  /** Levenshtein distance between s[0,sLen) and l[from,to), two-row DP
    * with `dp` as scratch (length >= sLen + 1).
    */
  private def dist(s: Array[Int], l: Array[Int], from: Int, to: Int, dp: Array[Int]): Int = {
    val m = s.length
    var j = 0
    while (j <= m) { dp(j) = j; j += 1 }
    var i = from
    while (i < to) {
      var prev = dp(0) // dp[i-1][j-1]
      dp(0) = i - from + 1
      var k = 1
      while (k <= m) {
        val cur = dp(k)
        val cost = if (l(i) == s(k - 1)) 0 else 1
        var v = prev + cost
        val del = cur + 1
        if (del < v) v = del
        val ins = dp(k - 1) + 1
        if (ins < v) v = ins
        dp(k) = v
        prev = cur
        k += 1
      }
      i += 1
    }
    dp(m)
  }

  def sim(a: UTF8String, b: UTF8String): Double = {
    val ac = a.toString.codePoints().toArray
    val bc = b.toString.codePoints().toArray
    val (s, l) = if (ac.length <= bc.length) (ac, bc) else (bc, ac)
    val m = s.length
    if (m == 0) return 0.0
    val dp = new Array[Int](m + 1)
    var best = 1.0
    var wl = math.max(m - 1, 1)
    while (wl <= m + 1) {
      val denom = math.max(m, wl).toDouble
      val nWin = math.max(l.length - wl + 1, 1)
      var i = 0
      while (i < nWin) {
        val to = math.min(i + wl, l.length)
        val r = dist(s, l, i, to, dp) / denom
        if (r < best) best = r
        i += 1
      }
      wl += 1
    }
    1.0 - best
  }
}

/** Column API for the native expression
  * ([[org.apache.spark.sql.graft.PartialRatioSimExpr]] — lives under the
  * spark.sql package because the expression-author API is private[sql]).
  */
object PartialRatio {
  def sim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.PartialRatioSimExpr.sim(a, b)
}
