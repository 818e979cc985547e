package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Calendar interval grammar + boundary enumeration (months/years have
 *  no fixed second length — upstream duration grammar units `n`/`y`).
 *  Epoch literals below are stated as their civil datetimes so the
 *  expectations are auditable against any calendar. */
class CalendarIntervalsSpec extends AnyFunSuite {

  test("grammar: n/y are calendar, fixed units are not, toSeconds stays loud") {
    assert(Intervals.isCalendar("1n"))
    assert(Intervals.isCalendar("3n"))
    assert(Intervals.isCalendar("1y"))
    assert(!Intervals.isCalendar("1d"))
    assert(!Intervals.isCalendar("1w"))
    assert(!Intervals.isCalendar("0n"), "zero-count is not a bucket width")
    assert(!Intervals.isCalendar("auto"))
    assert(!Intervals.isCalendar("0all"))
    // any fixed-seconds consumer reaching a calendar interval is a
    // routing bug — toSeconds must keep throwing
    intercept[IllegalArgumentException](Intervals.toSeconds("1n"))
    intercept[IllegalArgumentException](Intervals.toSeconds("1y"))
    // counts are digit-capped (no Long overflow on parse) and bounded
    // at 1000 years — a runaway count can't compile a runaway CASE
    assert(!Intervals.isCalendar("999999999999999999999n"))
    assert(!Intervals.isCalendar("99999n"), "over MaxCalendarCount")
    assert(Intervals.isCalendar("12000n"))
    intercept[IllegalArgumentException](
      Intervals.calendarBoundaries("99999y", "UTC", 0L, 1L))
  }

  test("UTC monthly boundaries: floor-to-calendar start, leap February") {
    // [Jan 5, Mar 15) 2024 UTC: first boundary is Jan 1 (AT OR BEFORE
    // start — the partial leading bucket labels at its calendar start)
    val bs = Intervals.calendarBoundaries("1n", "UTC", 1704412800L, 1710460800L)
    assert(bs === Seq(1704067200L, 1706745600L, 1709251200L)) // Jan/Feb/Mar 1
    // 2024 is a leap year: the Feb bucket is exactly 29 days
    assert(bs(2) - bs(1) === 29L * 86400)
    assert(bs(1) - bs(0) === 31L * 86400)
  }

  test("Denver monthly boundaries sit at local midnight across the DST change") {
    // [Jan 1 2024 00:00Z, Apr 20 2024Z): Jan 1 00:00Z is Dec 31 17:00
    // Denver, so the floor boundary is Dec 1 2023; Jan–Mar boundaries
    // at 07:00Z (MST −7), April at 06:00Z (MDT −6 after Mar 10)
    val bs = Intervals.calendarBoundaries(
      "1n", "America/Denver", 1704067200L, 1713571200L)
    assert(bs === Seq(
      1701414000L, // 2023-12-01 00:00 MST
      1704092400L, // 2024-01-01 00:00 MST
      1706770800L, // 2024-02-01 00:00 MST
      1709276400L, // 2024-03-01 00:00 MST
      1711951200L  // 2024-04-01 00:00 MDT (−6h: the DST change moved midnight)
    ))
  }

  test("quarters anchor at the epoch calendar, not the query range") {
    // "3n" starting mid-November 2023 must floor to OCTOBER 1 (month
    // index 645 ≡ 0 mod 3 ends the Oct/Nov/Dec quarter), not November
    val bs = Intervals.calendarBoundaries(
      "3n", "America/Denver", 1700000000L, 1706770800L)
    assert(bs === Seq(
      1696140000L, // 2023-10-01 00:00 MDT
      1704092400L  // 2024-01-01 00:00 MST
    ))
  }

  test("years: a UTC instant in local 2023 floors to the 2023 boundary") {
    // Jan 1 2024 00:00Z is still 2023 in Denver
    val bs = Intervals.calendarBoundaries(
      "1y", "America/Denver", 1704067200L, 1706140800L)
    assert(bs === Seq(
      1672556400L, // 2023-01-01 00:00 MST
      1704092400L  // 2024-01-01 00:00 MST
    ))
  }

  test("ordinals are absolute (month index / step), range-independent") {
    // Jan 2024 is month index 648 since 1970-01 → quarter ordinal 216;
    // Oct 2023 (645) → 215 — whatever range the query asked for
    val o1 = Intervals.calendarOrdinals("3n", "UTC", 1704412800L, 1706140800L)
    assert(o1 === Seq(1704067200L -> 216L))
    val o2 = Intervals.calendarOrdinals("3n", "America/Denver",
      1700000000L, 1706770800L)
    assert(o2.map(_._2) === Seq(215L, 216L))
    // monthly ordinals step by 1
    val o3 = Intervals.calendarOrdinals("1n", "UTC", 1704412800L, 1710460800L)
    assert(o3.map(_._2) === Seq(648L, 649L, 650L))
  }

  test("property: boundaries tile every range — each instant has exactly one floor") {
    // across zones (incl. a half-hour offset and a southern-hemisphere
    // DST) × intervals × range anchors: the boundary list is strictly
    // increasing, covers start from below, and for sampled instants the
    // floor (greatest boundary <= t) exists, is unique, and is stable
    // when the probe re-derives it from a WIDER range — i.e. labels are
    // absolute, never a function of the query window
    val zones = Seq("UTC", "America/Denver", "Asia/Kolkata", "Australia/Sydney")
    val anchors = Seq(1577836800L /* 2020 */, 1704067200L /* 2024 */,
      946684800L /* 2000 */)
    for (zone <- zones; iv <- Seq("1n", "2n", "3n", "1y"); a <- anchors) {
      val (start, end) = (a + 1234567, a + 1234567 + 500L * 86400)
      val bs = Intervals.calendarBoundaries(iv, zone, start, end)
      assert(bs.zip(bs.tail).forall { case (x, y) => x < y }, s"$zone $iv $a asc")
      assert(bs.head <= start && bs.last < end, s"$zone $iv $a cover")
      val wide = Intervals.calendarBoundaries(iv, zone, start - 400L * 86400, end)
      for (t <- Seq(start, start + 86400 * 37, (start + end) / 2, end - 1)) {
        val floorNarrow = bs.filter(_ <= t).last
        val floorWide = wide.filter(_ <= t).last
        assert(floorNarrow === floorWide,
          s"$zone $iv $a: floor of $t depends on the query window")
      }
    }
  }

  test("boundary invariants: first <= start < second (when any), last < end") {
    for (zone <- Seq("UTC", "America/Denver", "Asia/Kolkata");
         iv <- Seq("1n", "2n", "3n", "1y")) {
      val start = 1704412800L; val end = 1720000000L
      val bs = Intervals.calendarBoundaries(iv, zone, start, end)
      assert(bs.head <= start, s"$zone $iv head")
      assert(bs.tail.headOption.forall(_ > start), s"$zone $iv second")
      assert(bs.last < end, s"$zone $iv last")
      assert(bs === bs.sorted && bs.distinct == bs, s"$zone $iv ordered")
    }
  }
}
