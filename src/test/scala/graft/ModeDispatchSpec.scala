package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ModeDispatch
import graft.pipeline.ModeDispatch.{Daily, Monthly}

/** Mirrors the reference's test_detection.py cases plus boundary months. */
class ModeDispatchSpec extends AnyFunSuite {

  private def d(s: String) = LocalDate.parse(s)

  test("full calendar months are monthly") {
    assert(ModeDispatch.classify(d("2024-09-01"), d("2024-09-30")) == Monthly)
    assert(ModeDispatch.classify(d("2024-02-01"), d("2024-02-29")) == Monthly) // leap
    assert(ModeDispatch.classify(d("2023-02-01"), d("2023-02-28")) == Monthly)
  }

  test("more than 31 days is monthly even across month edges") {
    assert(ModeDispatch.classify(d("2024-09-15"), d("2024-10-20")) == Monthly) // 36 days
    assert(ModeDispatch.classify(d("2024-09-15"), d("2024-10-14")) == Daily)   // 30 days, two months
  }

  test("75 percent of one month is monthly") {
    // September: 30 days, 75% = 22.5 -> 23 days suffice
    assert(ModeDispatch.classify(d("2024-09-01"), d("2024-09-23")) == Monthly)
    assert(ModeDispatch.classify(d("2024-09-01"), d("2024-09-22")) == Daily) // 22 days < 22.5
    // 31-day month: 75% = 23.25 -> 24 days
    assert(ModeDispatch.classify(d("2024-10-01"), d("2024-10-24")) == Monthly)
    assert(ModeDispatch.classify(d("2024-10-02"), d("2024-10-24")) == Daily)
  }

  test("short ranges are daily unless the flag forces monthly storage") {
    assert(ModeDispatch.classify(d("2024-09-01"), d("2024-09-03")) == Daily)
    assert(ModeDispatch.classify(d("2024-09-01"), d("2024-09-03"),
      dailyProcessing = true) == Monthly)
  }

  test("collection keys: daily yyyyMMdd vs monthly first-of-month routing") {
    assert(ModeDispatch.collectionKey(d("2024-09-17"), Daily) == "20240917")
    assert(ModeDispatch.collectionKey(d("2024-09-17"), Monthly) == "20240901")
  }
}
