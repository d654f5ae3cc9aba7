package graft

/** Shared test-image construction: 9×8 24-bit BMPs whose gradient-sign
  * pattern (and therefore dHash64 after the 1:1 grid decode) is exactly a
  * requested 64-bit pattern. See MultimodalSpec's dHash tests and
  * IncrementalImageDedupSpec.
  */
object TestImages {

  /** 9×8 24-bit BMP whose gradient-sign pattern IS `bits` (64 entries,
    * bit i = row·8 + col): v(0,y)=128, v(x+1,y) = v(x,y) ± 2 by bit.
    * The 1:1 grid mapping makes decoded luma equal the pixel value, so
    * the image's dHash64 equals the requested bit pattern exactly.
    */
  def bmpOfBits(bits: Seq[Int]): Array[Byte] = {
    require(bits.length == 64)
    val v = Array.ofDim[Int](8, 9)
    for (y <- 0 until 8) {
      v(y)(0) = 128
      for (x <- 0 until 8)
        v(y)(x + 1) = v(y)(x) + (if (bits(y * 8 + x) == 1) 2 else -2)
    }
    val sb = new StringBuilder("424D16010000000000003600000028000000" +
      "0900000008000000" + "01001800" + "00000000" + "E0000000" +
      "130B0000130B0000" + "0000000000000000")
    for (ys <- 0 until 8) {
      val yTop = 7 - ys // bottom-up row order
      for (x <- 0 until 9; _ <- 0 until 3) sb.append(f"${v(yTop)(x)}%02X")
      sb.append("00")
    }
    sb.toString.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  /** `base` with the given bit positions flipped. */
  def flip(base: Seq[Int], positions: Int*): Seq[Int] =
    positions.foldLeft(base)((b, p) => b.updated(p, 1 - b(p)))
}
