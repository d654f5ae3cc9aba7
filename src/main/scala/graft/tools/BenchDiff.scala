package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Mechanical application of BASELINE.md's "Regression rule (round 17+)
  * — counters first, wall second" between two `bench_out.json` records
  * (e.g. last round's committed record vs this round's candidate).
  * No SparkSession — pure record comparison.
  *
  * args: `oldBench.json newBench.json`
  *
  * Per common query, in the documented gate order:
  *   1. `plan_shape_hash` — compared ONLY when both records carry the
  *      same `plan_hash_version` (a masking-algorithm change re-baselines
  *      every hash without any plan changing; records before r17 default
  *      to version 2). A changed shape is a `PLAN` finding: diff the
  *      dumped plans (`SPARK_GRAFT_PLAN_DUMP`) before reading timing.
  *   2. Structural counters from the min-steady run — `jobs` must be
  *      exact; `shuffle_read_b`/`shuffle_write_b` may move ±20 % (AQE
  *      coalescing jitter, compression variance). A violation is a
  *      `STRUCT` finding regardless of wall time — UNLESS either side's
  *      measured run recorded `stage_retries` > 0 (or predates the
  *      counter): a stage resubmission re-reads/rewrites shuffle data
  *      inside the same job, so byte excursions with stable shape + jobs
  *      on a retried run are environment, not plan (the r17
  *      q_span_removal finding — +32 % read in one window, 8
  *      byte-identical isolated runs). Skipped with a notice when the
  *      old record predates the counters (pre-r17).
  *   3. Wall time NEVER produces a finding on its own — the r16
  *      adjudication proved sf0.1 wall noise-saturated (70–114 s across
  *      four same-plan windows). The tool prints the worst wall ratios
  *      as `INFO wall` corroboration lines, with each side's load
  *      context, only for queries whose shape + counters held still.
  *
  * Output: one line per finding, then a single summary JSON line. Exit
  * status 1 iff any PLAN/STRUCT/REMOVED finding — usable as a CI gate.
  * [[diff]] is the pure core (spec-tested on synthetic records); `main`
  * only does IO and the exit code.
  */
object BenchDiff {
  private def lng(n: JsonNode, f: String, dflt: Long = -1L): Long =
    if (n.hasNonNull(f)) n.get(f).asLong(dflt) else dflt
  private def dbl(n: JsonNode, f: String): Double =
    if (n.hasNonNull(f)) n.get(f).asDouble(-1.0) else -1.0
  private def str(n: JsonNode, f: String): String =
    if (n.hasNonNull(f)) n.get(f).asText("") else ""

  /** Compare two bench-record JSON strings; returns (findings, lines)
    * where findings counts PLAN + STRUCT + REMOVED and lines is the full
    * human-readable report including the trailing summary-JSON line.
    */
  def diff(oldJson: String, newJson: String): (Int, Seq[String]) = {
    val out = Vector.newBuilder[String]
    val m = new ObjectMapper()
    val oldR = m.readTree(oldJson)
    val newR = m.readTree(newJson)
    val oldV = lng(oldR, "plan_hash_version", 2L)
    val newV = lng(newR, "plan_hash_version", 2L)
    val hashComparable = oldV == newV
    if (!hashComparable)
      out += s"NOTE plan_hash_version $oldV -> $newV: masking algorithm changed, " +
        "every hash re-baselines — shape comparison SKIPPED, counters only"
    val oldQ = oldR.get("queries"); val newQ = newR.get("queries")
    val oldNames = oldQ.fieldNames.asScala.toVector
    val newNames = newQ.fieldNames.asScala.toVector
    // the old record may predate the r17 structural counters
    val countersInOld = oldNames.exists(n => lng(oldQ.get(n), "jobs") >= 0)
    if (!countersInOld)
      out += "NOTE old record carries no structural counters (pre-r17) — " +
        "counter comparison SKIPPED; wall lines are advisory only"

    var plan, struct = 0
    val removed = oldNames.filterNot(newNames.contains)
    removed.foreach(n => out += s"REMOVED $n: present in old record only")
    newNames.filterNot(oldNames.contains)
      .foreach(n => out += s"INFO added $n (no prior record)")

    val wallRatios = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    for (name <- newNames if oldNames.contains(name)) {
      val o = oldQ.get(name); val n = newQ.get(name)
      var flagged = false
      if (hashComparable && str(o, "plan_shape_hash") != str(n, "plan_shape_hash")) {
        plan += 1; flagged = true
        out += s"PLAN $name: plan_shape_hash ${str(o, "plan_shape_hash")} -> " +
          s"${str(n, "plan_shape_hash")} — diff SPARK_GRAFT_PLAN_DUMP output before reading timing"
      } else if (countersInOld) {
        val (jo, jn) = (lng(o, "jobs"), lng(n, "jobs"))
        if (jo >= 0 && jn >= 0 && jo != jn) {
          struct += 1; flagged = true
          out += s"STRUCT $name: jobs $jo -> $jn (steady-run job count is exact by rule)"
        }
        // byte excursions demote to INFO on a retried (or retry-unknown)
        // run — see the scaladoc's rule-2 exception
        val (rto, rtn) = (lng(o, "stage_retries"), lng(n, "stage_retries"))
        val retryFree = rto == 0 && rtn == 0
        for ((f, label) <- Seq("shuffle_read_b" -> "shuffle read",
                               "shuffle_write_b" -> "shuffle write")) {
          val (bo, bn) = (lng(o, f), lng(n, f))
          if (bo >= 0 && bn >= 0 && math.abs(bn - bo) > 0.20 * math.max(bo, 1L)) {
            val pct = f"${100.0 * (bn - bo) / math.max(bo, 1L)}%+.0f%%"
            if (retryFree) {
              struct += 1; flagged = true
              out += s"STRUCT $name: $label $bo -> $bn B ($pct > ±20%, stage_retries 0 on both sides)"
            } else
              out += s"INFO bytes $name: $label $bo -> $bn B ($pct) with stable jobs/shape and " +
                s"stage_retries $rto -> $rtn — retry/recompute traffic, not a plan finding"
          }
        }
        val (ho, hn) = (lng(o, "peak_heap_mb"), lng(n, "peak_heap_mb"))
        if (!flagged && ho > 0 && hn > 2 * ho)
          // the per-pool peak stamp is GC-timing-dependent: under load GC
          // runs later and peaks read higher with nothing accumulating —
          // carry both windows' gc_ms for attribution
          out += s"INFO heap $name: peak_heap_mb $ho -> $hn with stable counters " +
            s"(gc_ms ${lng(o, "gc_ms")} -> ${lng(n, "gc_ms")}) — GC-timing-sensitive; " +
            "investigate only if it persists across clean windows"
      }
      val (to, tn) = (dbl(o, "time"), dbl(n, "time"))
      if (!flagged && to > 0 && tn > 0) wallRatios += name -> (tn / to)
    }

    // corroboration only: the five worst wall ratios among structurally
    // quiet queries, with both windows' load context for attribution
    val worst = wallRatios.sortBy(-_._2).take(5)
    if (worst.nonEmpty) {
      def lf(r: JsonNode): Double =
        if (r.hasNonNull("load")) dbl(r.get("load"), "load_factor") else -1.0
      val lfO = lf(oldR); val lfN = lf(newR)
      worst.foreach { case (name, r) =>
        out += f"INFO wall $name: ${r}%.2fx (load_factor $lfO%.2f -> $lfN%.2f, " +
          f"load_1m ${dbl(oldQ.get(name), "load_1m")}%.1f -> ${dbl(newQ.get(name), "load_1m")}%.1f) — " +
          "corroboration only, NOT a finding (BASELINE.md rule 3)"
      }
    }

    val findings = plan + struct + removed.size
    out += s"""{"plan_findings":$plan,"struct_findings":$struct,"removed":${removed.size},""" +
      s""""common":${newNames.count(oldNames.contains)},"hash_comparable":$hashComparable,""" +
      s""""counters_compared":$countersInOld,"old_version":$oldV,"new_version":$newV}"""
    (findings, out.result())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff oldBench.json newBench.json")
    def read(p: String) = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    val (findings, lines) = diff(read(args(0)), read(args(1)))
    lines.foreach(println)
    if (findings > 0) sys.exit(1)
  }
}
