package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** JVM-side kernel for the native NFC normalization expression
  * ([[org.apache.spark.sql.graft.NfcNormalizeExpr]]) — one static call
  * site referenced from both interpreted eval and generated code, like
  * [[VectorOps]].
  */
object UnicodeOps {

  /** Unicode NFC (canonical composition). Two-tier fast path for the
    * common cases of a real corpus:
    *  - pure ASCII (numBytes == numChars — every UTF-8 multi-byte char
    *    makes chars < bytes) is always NFC: return the SAME UTF8String
    *    after one byte-length scan, no decode, no allocation;
    *  - non-ASCII but already-normalized input passes the String decode
    *    to isNormalized and still returns the original UTF8String;
    * only strings actually containing decomposed sequences pay
    * Normalizer.normalize.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
