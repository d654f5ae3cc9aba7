package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over event streams: as-of join and gap
  * sessionization — the two time-series primitives the brief names that
  * Spark has no single built-in operator for (as-of) or that deserve the
  * built-in it does have (session_window). Neither exists in the
  * reference; they are the event-log half of the 100 TB pipeline layer.
  */
object Temporal {

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTs <= leftTs` (or `< leftTs` when `strict`) for the
    * same key — "the last quote before this trade", "the last view before
    * this click". Left rows with no prior right row keep null payloads
    * (left-join semantics).
    *
    * NOT implemented as a range join: a range-condition join explodes to
    * |left|·|right| comparisons per key and Spark plans it as a
    * nested-loop. Instead the classic MERGE shape: tag both sides, union,
    * ONE hash exchange on the key, one per-key sort on (ts, tag), and a
    * running `last(payload, ignoreNulls)` window — every right row's
    * payload flows forward to exactly the left rows it is the latest
    * predecessor of. Cost at any scale: one shuffle of (key, ts, payload),
    * no quadratic term, skew bounded by the biggest single key (the same
    * bound any per-key window has).
    *
    * Tag ordering gives the boundary semantics: right rows sort BEFORE
    * left rows at equal ts for `<=` (a right row at exactly leftTs is
    * visible), AFTER them for strict `<`. Among right rows sharing
    * (key, ts) the LAST in `rightOrder` wins — pass a deterministic
    * tiebreak column (e.g. an event id) if duplicates are possible.
    *
    * Null semantics match the SQL ASOF condition `r.ts <= l.ts AND
    * r.k = l.k` (which a null on either side never satisfies): right
    * rows with a null key or null ts are dropped up front — otherwise a
    * null ts would sort FIRST in the window and its payload would flow to
    * every left row with no real predecessor — and a left row with a
    * null key or ts keeps null payloads (its nulls never equal a right
    * key, and nothing sorts at-or-before a null ts but other nulls,
    * which the right side no longer has).
    *
    * @param leftCols     columns of `left` to carry through (must exist)
    * @param rightPayload (outputName, column-of-right) pairs delivered
    *                     as-of; null when no predecessor exists
    * @param rightOrder   deterministic tiebreak among right rows with
    *                     equal (key, ts) — the max wins
    */
  def asOfJoin(
      left: DataFrame, leftKey: Column, leftTs: Column, leftCols: Seq[String],
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[(String, Column)], rightOrder: Column,
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.StructType
    // fail HERE, not as an ambiguous-reference error three operators
    // downstream: the output schema is leftCols ++ payload names, so any
    // overlap (or payload-internal duplicate) produces duplicate columns
    val payloadNames = rightPayload.map(_._1)
    require(payloadNames.distinct.size == payloadNames.size,
      s"asOfJoin: duplicate rightPayload names: ${
        payloadNames.diff(payloadNames.distinct).distinct.mkString(", ")}")
    val clash = payloadNames.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"asOfJoin: rightPayload names collide with leftCols: ${clash.mkString(", ")}")
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)
    val payloadStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    // null-struct carriers for the other side's columns, typed from the
    // RESOLVED schemas (an unresolved Column has no dataType to ask)
    val leftType = StructType(left.select(leftCols.map(col): _*).schema.fields)
    val payloadType = StructType(
      right.select(rightPayload.map { case (n, c) => c.as(n) }: _*).schema.fields)
    // the tiebreak keeps its own type (a silent cast("long") would turn a
    // string id into null/ANSI-throw and break the "max wins" contract);
    // left rows carry a typed null — their relative order never affects
    // last(__p) because their __p is null
    val ordType = right.select(rightOrder).schema.head.dataType
    val r = right
      .filter(rightKey.isNotNull && rightTs.isNotNull)
      .select(
        rightKey.as("__k"), rightTs.as("__ts"), lit(rightTag).as("__tag"),
        rightOrder.as("__ord"), payloadStruct.as("__p"),
        lit(null).cast(leftType).as("__l"))
    val l = left.select(
      leftKey.as("__k"), leftTs.as("__ts"), lit(leftTag).as("__tag"),
      lit(null).cast(ordType).as("__ord"),
      lit(null).cast(payloadType).as("__p"),
      struct(leftCols.map(col): _*).as("__l"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === leftTag)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map { case (n, _) => col(s"__m.$n").as(n) }: _*)
  }

  /** Gap-based sessionization: groups each key's events into sessions
    * that close after `gap` without activity — Spark's native
    * `session_window` (AQE-mergeable, streaming-compatible: the SAME
    * grouping works under `readStream` with a watermark). Returns the
    * grouped dataset keyed by (key, session) ready for aggregation; the
    * session struct carries `start` (first event ts) and `end` (last
    * event ts + gap).
    *
    * Boundary semantics (measured, spec-pinned): the merge bound is
    * INCLUSIVE — an event landing exactly `gap` after its predecessor
    * still merges; only a strictly larger gap starts a new session.
    * One hash exchange on the key; session merging is per-partition.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gap: String)
      : org.apache.spark.sql.RelationalGroupedDataset =
    df.groupBy(key, session_window(ts, gap).as("session"))

  /** Trailing calendar-day RANGE frame: for each row, the frame holds
    * every partition row whose `day` lies in [day − (days−1), day] — a
    * CALENDAR distance, so absent days are simply missing from the frame
    * rather than stretching it the way a ROWS frame stretches across
    * gaps. Spark's `rangeBetween` needs a numeric order key, so the
    * frame runs over the epoch-day index (`datediff` from 1970-01-01);
    * the partition is one hash exchange + sort, and callers windowing a
    * pre-aggregated (key, day) relation keep it tiny at any input scale.
    */
  def trailingDayWindow(partition: Column, day: Column, days: Int)
      : org.apache.spark.sql.expressions.WindowSpec = {
    require(days >= 1, s"days must be >= 1, got $days")
    Window.partitionBy(partition)
      .orderBy(datediff(day, to_date(lit("1970-01-01"))))
      .rangeBetween(-(days - 1).toLong, 0L)
  }
}
