package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

/** [[SpanDedup]]: duplicated k-gram positions are exactly the cross-doc
  * shared spans (intra-doc repetition does NOT count), coverage is the
  * interval union, short docs are safe. k=10 fixture with hand-placed
  * spans.
  */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  private val K = 10

  private val docs = Seq(
    (1L, "xx0123456789yy"),       // shares the single gram "0123456789" with d2
    (2L, "0123456789abcd"),
    (3L, "no overlap here at all!!"),
    (4L, "short"),                // len < k: no positions
    (5L, "ppABCDEFGHIJKLqq"),     // 12-char span shared with d6 -> 3 grams
    (6L, "ABCDEFGHIJKLrr"),
    (7L, "MMMMMMMMMMMMMMMMMMMM")  // heavy INTRA-doc repetition only
  ).toDF("doc_id", "text")

  test("positions: exactly the cross-doc shared grams; intra-doc repeats excluded") {
    val got = SpanDedup.duplicateSpanPositions(docs, "doc_id", "text", K)
      .select($"doc_id", $"pos").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === Set(
      (1L, 3), (2L, 1),
      (5L, 3), (5L, 4), (5L, 5),
      (6L, 1), (6L, 2), (6L, 3)))
  }

  test("coverage: interval union of equal-length spans, only hit docs emitted") {
    val got = SpanDedup.duplicateSpanCoverage(docs, "doc_id", "text", K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 1L, 10L),  // one gram -> k chars
      (2L, 1L, 10L),
      (5L, 3L, 12L),  // 3 overlapping grams union to the 12-char span
      (6L, 3L, 12L)))
  }

  test("removal: canonical occurrence survives, every other copy is cut, kept text exact") {
    val corpus = Seq(
      (1L, "xx0123456789yy"),           // canonical home of "0123456789" (min doc, pos 3)
      (2L, "0123456789abcd"),           // copy at pos 1 -> cut
      (5L, "ppABCDEFGHIJKLqq"),         // canonical home of the 12-char span
      (6L, "ABCDEFGHIJKLrr"),           // copy -> 3 grams merge to one island
      (7L, "MMMMMMMMMMMMMMMMMMMM"),     // intra-doc-only repeat: untouched
      (8L, "zz0123456789zz0123456789"), // two NON-canonical copies -> two islands
      (9L, "QRSTUVWXYZ"),               // identical pair: 9 canonical,
      (10L, "QRSTUVWXYZ")               // 10 fully removed -> kept ''
    ).toDF("doc_id", "text")
    val got = SpanDedup.removeDuplicateSpans(corpus, "doc_id", "text", K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(
      (2L, 10L, "abcd"),
      (6L, 12L, "rr"),
      (8L, 20L, "zzzz"),
      (10L, 10L, "")))
  }

  test("carry columns ride through; all-unique corpus yields empty output") {
    val tagged = docs.withColumn("src", concat(lit("s"), $"doc_id" % 2))
    val cov = SpanDedup.duplicateSpanCoverage(tagged, "doc_id", "text", K,
      carry = Seq("src"))
    assert(cov.columns.toSeq === Seq("src", "doc_id", "n_dup_pos", "dup_chars"))
    val unique = Seq((1L, "abcdefghijklmnop"), (2L, "qrstuvwxyz123456"))
      .toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpanPositions(unique, "doc_id", "text", K).count() === 0L)
  }
}
