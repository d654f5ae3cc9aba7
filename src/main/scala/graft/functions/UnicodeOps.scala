package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** JVM-side kernel for the native NFC normalization expression
  * ([[org.apache.spark.sql.graft.NfcNormalizeExpr]]) — one static call
  * site referenced from both interpreted eval and generated code, like
  * [[VectorOps]].
  */
object UnicodeOps {

  /** Unicode NFC (canonical composition). Fast path: already-normalized
    * input (the overwhelmingly common case in real corpora — ASCII is
    * always normalized) returns the SAME UTF8String, no decode and no
    * re-allocation; only strings that actually contain decomposed
    * sequences pay the String round-trip.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
