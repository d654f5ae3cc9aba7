package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.tools.BenchDiff.diff]] — the executable form of
  * BASELINE.md's counters-first regression rule — on synthetic records:
  * gate order, the stage-retry demotion, cross-version refusal, and the
  * pre-r17 counterless fallback. Pure JVM, no SparkSession.
  */
class BenchDiffSpec extends AnyFunSuite {

  private def rec(
      version: Option[Int],
      queries: Seq[(String, String)]): String = {
    val vs = version.fold("")(v => s""""plan_hash_version":$v,""")
    val qs = queries.map { case (n, body) => s""""$n":{$body}""" }.mkString(",")
    s"""{"metric":"total","value":1.0,$vs"load":{"load_factor":1.00},"queries":{$qs}}"""
  }
  private def q(
      shape: String, jobs: Long, readB: Long, writeB: Long,
      retries: Long = 0, time: Double = 1.0, heapMb: Long = 100): String =
    s""""time":$time,"cold":$time,"rows":10,"gc_ms":1,"jobs":$jobs,""" +
      s""""cold_jobs":$jobs,"shuffle_read_b":$readB,"shuffle_write_b":$writeB,""" +
      s""""stage_retries":$retries,"peak_heap_mb":$heapMb,"load_1m":1.0,""" +
      s""""plan_hash":"$shape","plan_shape_hash":"$shape""""

  test("identical records produce zero findings") {
    val r = rec(Some(3), Seq("q_a" -> q("aa", 5, 1000, 1000)))
    val (n, lines) = tools.BenchDiff.diff(r, r)
    assert(n === 0)
    assert(!lines.exists(l => l.startsWith("PLAN") || l.startsWith("STRUCT")))
  }

  test("shape-hash change is a PLAN finding and pre-empts counter reads") {
    val o = rec(Some(3), Seq("q_a" -> q("aa", 5, 1000, 1000)))
    // shape changed AND jobs changed: rule 1 fires, rule 2 must not
    // double-count the same query
    val nw = rec(Some(3), Seq("q_a" -> q("bb", 9, 9000, 9000)))
    val (n, lines) = tools.BenchDiff.diff(o, nw)
    assert(n === 1)
    assert(lines.count(_.startsWith("PLAN q_a")) === 1)
    assert(!lines.exists(_.startsWith("STRUCT")))
  }

  test("jobs drift and retry-free byte excursions are STRUCT findings") {
    val o = rec(Some(3), Seq(
      "q_jobs" -> q("aa", 5, 1000, 1000),
      "q_read" -> q("bb", 5, 1000, 1000)))
    val nw = rec(Some(3), Seq(
      "q_jobs" -> q("aa", 6, 1000, 1000),
      "q_read" -> q("bb", 5, 1300, 1000))) // +30% read, retries 0/0
    val (n, lines) = tools.BenchDiff.diff(o, nw)
    assert(n === 2)
    assert(lines.exists(_.startsWith("STRUCT q_jobs: jobs 5 -> 6")))
    assert(lines.exists(l => l.startsWith("STRUCT q_read") && l.contains("shuffle read")))
  }

  test("byte excursion on a retried run demotes to INFO (rule-2 exception)") {
    val o = rec(Some(3), Seq("q_a" -> q("aa", 5, 1000, 1000)))
    val nw = rec(Some(3), Seq("q_a" -> q("aa", 5, 1500, 1010, retries = 1)))
    val (n, lines) = tools.BenchDiff.diff(o, nw)
    assert(n === 0, lines.mkString("\n"))
    assert(lines.exists(l => l.startsWith("INFO bytes q_a") && l.contains("stage_retries 0 -> 1")))
  }

  test("byte excursion vs a record predating stage_retries also demotes") {
    val noRetryField = rec(Some(3), Seq("q_a" ->
      (""""time":1.0,"cold":1.0,"rows":10,"gc_ms":1,"jobs":5,"cold_jobs":5,""" +
        """"shuffle_read_b":1000,"shuffle_write_b":1000,"peak_heap_mb":100,""" +
        """"load_1m":1.0,"plan_hash":"aa","plan_shape_hash":"aa"""")))
    val nw = rec(Some(3), Seq("q_a" -> q("aa", 5, 1500, 1000)))
    val (n, lines) = tools.BenchDiff.diff(noRetryField, nw)
    assert(n === 0, lines.mkString("\n"))
    assert(lines.exists(_.startsWith("INFO bytes q_a")))
  }

  test("wall drift alone is never a finding, only corroboration") {
    val o = rec(Some(3), Seq("q_a" -> q("aa", 5, 1000, 1000, time = 1.0)))
    val nw = rec(Some(3), Seq("q_a" -> q("aa", 5, 1000, 1000, time = 3.0)))
    val (n, lines) = tools.BenchDiff.diff(o, nw)
    assert(n === 0)
    assert(lines.exists(l => l.startsWith("INFO wall q_a: 3.00x") && l.contains("NOT a finding")))
  }

  test("cross-version records refuse hash comparison but still compare counters") {
    val o = rec(Some(2), Seq("q_a" -> q("aa", 5, 1000, 1000)))
    val nw = rec(Some(3), Seq("q_a" -> q("bb", 6, 1000, 1000))) // hash moved: masked; jobs moved: real
    val (n, lines) = tools.BenchDiff.diff(o, nw)
    assert(lines.exists(_.startsWith("NOTE plan_hash_version 2 -> 3")))
    assert(!lines.exists(_.startsWith("PLAN")))
    assert(n === 1 && lines.exists(_.startsWith("STRUCT q_a: jobs 5 -> 6")))
  }

  test("missing plan_hash_version defaults to 2 (pre-r17 records)") {
    val o = rec(None, Seq("q_a" -> q("aa", 5, 1000, 1000)))
    val nw = rec(Some(3), Seq("q_a" -> q("aa", 5, 1000, 1000)))
    val (_, lines) = tools.BenchDiff.diff(o, nw)
    assert(lines.exists(_.contains("plan_hash_version 2 -> 3")))
  }

  test("counterless old record skips counters with a notice; removals are findings") {
    val o = rec(Some(2), Seq(
      "q_gone" -> (""""time":1.0,"rows":10,"plan_hash":"aa","plan_shape_hash":"aa""""),
      "q_a" -> (""""time":1.0,"rows":10,"plan_hash":"aa","plan_shape_hash":"aa"""")))
    val nw = rec(Some(2), Seq("q_a" -> q("bb", 6, 9999, 9999)))
    val (n, lines) = tools.BenchDiff.diff(o, nw)
    assert(lines.exists(_.startsWith("NOTE old record carries no structural counters")))
    // same version: shape IS comparable -> PLAN for q_a; REMOVED for q_gone
    assert(n === 2)
    assert(lines.exists(_.startsWith("REMOVED q_gone")))
    assert(lines.exists(_.startsWith("PLAN q_a")))
    assert(!lines.exists(_.startsWith("STRUCT")))
  }
}
