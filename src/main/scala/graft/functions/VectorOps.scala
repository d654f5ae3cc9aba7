package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Row-level kernels shared by the native vector expressions'
  * interpreted-eval and generated-code paths (static calls, Java-friendly
  * signatures — same pattern as [[PartialRatioImpl]]).
  */
object VectorOps {

  /** Sparse ±1 sign-projection fingerprint, packed little-endian into
    * ⌈h/64⌉ words: bit j of the sketch is set iff
    * Σ_t sgn(off(j)+t) · emb(idx(off(j)+t)) >= 0.
    *
    * Throws on a null element or a vector too narrow for the planes — a
    * degenerate row must never silently share a fingerprint (it would put
    * every such row in every hamming ball and quietly re-linearize the
    * probe scan).
    */
  def sparseSketch(
      emb: ArrayData, idx: Array[Int], sgn: Array[Double], off: Array[Int],
      h: Int, isFloat: Boolean): Array[Long] = {
    val n = emb.numElements()
    val out = new Array[Long]((h + 63) / 64)
    var j = 0
    while (j < h) {
      var s = 0.0
      var p = off(j)
      val end = off(j + 1)
      while (p < end) {
        val i = idx(p)
        if (i >= n || emb.isNullAt(i)) {
          throw new IllegalArgumentException(
            s"sparse_sign_sketch: null element or embedding width $n < required ${i + 1}")
        }
        s += sgn(p) * (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i))
        p += 1
      }
      if (s >= 0) out(j >> 6) |= 1L << (j & 63)
      j += 1
    }
    out
  }

  /** Word-wise popcount of XOR. Throws on word-count mismatch or null
    * words (sketches from different configs are a caller bug).
    */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"hamming_dist: word counts differ (${a.numElements()} vs ${b.numElements()})")
    }
    var c = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) {
        throw new IllegalArgumentException("hamming_dist: null sketch word")
      }
      c += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    c
  }
}
