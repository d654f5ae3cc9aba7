package graft.pipeline

import java.time.LocalDate

/** F9 driver-side plan logic: the reference's monthly-vs-daily range
  * classification (resilient_etl.py:256-276, unit-tested by its
  * test_detection.py). A date range is MONTHLY-grain when any of:
  *   1. the daily_processing flag is set (process daily, store monthly);
  *   2. it spans more than 31 days;
  *   3. it is a full calendar month (day 1 through the last day);
  *   4. it covers >= 75% of a single month.
  * Otherwise it is DAILY-grain.
  *
  * In the Spark engine the "mode" decides partition grain for routing
  * (which [[LakeMerge]] partitions a run touches and how
  * [[MonthlyRollup]] groups them), not execution strategy — the plans are
  * identical either way.
  */
object ModeDispatch {

  sealed trait Mode
  case object Monthly extends Mode
  case object Daily extends Mode

  /** Inclusive day count of [start, end] (the reference's
    * `date_range.days + 1`).
    */
  def totalDays(start: LocalDate, end: LocalDate): Long =
    java.time.temporal.ChronoUnit.DAYS.between(start, end) + 1

  def isFullMonth(start: LocalDate, end: LocalDate): Boolean =
    start.getDayOfMonth == 1 && end == start.withDayOfMonth(start.lengthOfMonth)

  def isMostOfMonth(start: LocalDate, end: LocalDate): Boolean = {
    val sameMonth = start.getMonth == end.getMonth && start.getYear == end.getYear
    sameMonth && totalDays(start, end) >= start.lengthOfMonth * 0.75
  }

  def classify(start: LocalDate, end: LocalDate,
      dailyProcessing: Boolean = false): Mode =
    if (dailyProcessing || totalDays(start, end) > 31 ||
      isFullMonth(start, end) || isMostOfMonth(start, end)) Monthly
    else Daily

  /** The reference's collection-key bucketing (utils.py:583-584): daily
    * keys are yyyyMMdd of the event date; monthly keys route every day of
    * the month to its first day (resilient_etl.py:301). In the lake these
    * become partition-path prefixes.
    */
  def collectionKey(date: LocalDate, mode: Mode): String = {
    val d = mode match {
      case Monthly => date.withDayOfMonth(1)
      case Daily => date
    }
    d.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
  }
}
