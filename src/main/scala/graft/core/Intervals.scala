package graft.core

/**
 * Duration-string parsing ("1m", "5m", "1h", …) mirroring the reference's
 * fixed interval vocabulary (reference core/downsample/Interval.java:25-36:
 * 5s/10s/15s/30s/1m/5m/10m/15m/30m/1h/1d) plus the general
 * `<count><unit>` grammar the query layer accepts
 * (AuraMetricsNumericArrayIterator.java:222-230 via DateTime.parseDuration).
 */
object Intervals {
  private val Pattern = """^(\d+)(s|m|h|d|w)$""".r

  /** Parse a duration string to whole seconds. Throws on bad input. */
  def toSeconds(s: String): Long = s match {
    case Pattern(n, unit) =>
      val k = unit match {
        case "s" => 1L
        case "m" => 60L
        case "h" => 3600L
        case "d" => 86400L
        case "w" => 7L * 86400L
      }
      n.toLong * k
    case "0all" => -1L // whole-range marker (runAll, reference :199-202)
    case other => throw new IllegalArgumentException(s"bad interval: $other")
  }

  /** The reference's rollup-storable interval whitelist. */
  val RollupVocabulary: Set[String] =
    Set("5s", "10s", "15s", "30s", "1m", "5m", "10m", "15m", "30m", "1h", "1d")

  def isRollupInterval(s: String): Boolean = RollupVocabulary.contains(s)

  /** CALENDAR interval units from the upstream duration grammar
   *  (DateTime.parseDuration's `n` = months, `y` = years): these have no
   *  fixed second length — a month is 28–31 days, a year 365/366 — so
   *  they bucket on the civil calendar of the query's timezone instead
   *  of epoch arithmetic. `toSeconds` deliberately keeps throwing on
   *  them: any fixed-seconds consumer reaching a calendar interval is a
   *  routing bug and should fail loudly. */
  /** Count capped at 5 digits by the pattern (no Long overflow on
   *  parse) and at [[MaxCalendarCount]] by validation — 12000 months =
   *  1000 years, far beyond any real query range, and it bounds the
   *  compiled CASE chain. */
  private val CalendarPattern = """^(\d{1,5})(n|y)$""".r
  val MaxCalendarCount = 12000L

  def isCalendar(s: String): Boolean = s match {
    case CalendarPattern(n, _) => n.toLong > 0 && n.toLong <= MaxCalendarCount
    case _ => false
  }

  /** Ordered epoch boundaries of the calendar buckets covering
   *  [start, end) in `zone`: for "<k>n" every k-th month start (local
   *  midnight of the 1st), for "<k>y" every k-th January 1st. The grid
   *  anchors at the epoch calendar — month index since 1970-01 ≡ 0
   *  (mod step) — so "3n" is standard calendar quarters (Jan/Apr/Jul/
   *  Oct) regardless of the query range, the same absolute anchoring
   *  the fixed-interval `ts - ts % iv` floor has. The first boundary is
   *  the bucket start AT OR BEFORE `start` (a partial leading bucket
   *  labels at its true calendar start, the floor semantic); the last
   *  is strictly below `end`. A local midnight erased by a DST gap
   *  (zones that spring forward at 00:00) resolves forward by the gap,
   *  java.time's deterministic rule. Driver-side, O(range/step) —
   *  never a function of fact size. */
  def calendarBoundaries(interval: String, zone: String,
      start: Long, end: Long): Seq[Long] =
    calendarOrdinals(interval, zone, start, end).map(_._1)

  /** [[calendarBoundaries]] paired with each boundary's ABSOLUTE bucket
   *  ordinal — the bucket's month index since 1970-01 divided by the
   *  step, the calendar analog of the fixed path's `bucket_ts DIV iv`.
   *  Seasonal consumers (olympic anomaly's position index) key slots on
   *  this so a slot assignment never depends on the query range. */
  def calendarOrdinals(interval: String, zone: String,
      start: Long, end: Long): Seq[(Long, Long)] = {
    require(start < end, s"empty range: [$start, $end)")
    val (n, unit) = interval match {
      case CalendarPattern(k, u) => (k.toInt, u) // pattern caps digits — no overflow
      case other => throw new IllegalArgumentException(s"not a calendar interval: $other")
    }
    require(n > 0 && n <= MaxCalendarCount,
      s"calendar interval count out of range (1..$MaxCalendarCount): $interval")
    val stepMonths = unit match { case "n" => n; case "y" => 12 * n }
    val zid = java.time.ZoneId.of(zone)
    def boundary(monthIdx: Int): Long =
      java.time.ZonedDateTime.of(1970 + Math.floorDiv(monthIdx, 12),
        Math.floorMod(monthIdx, 12) + 1, 1, 0, 0, 0, 0, zid).toEpochSecond
    val local = java.time.Instant.ofEpochSecond(start).atZone(zid)
    val mi0raw = (local.getYear - 1970) * 12 + (local.getMonthValue - 1)
    var mi = Math.floorDiv(mi0raw, stepMonths) * stepMonths
    // the grid anchor floors the month index, but a sub-month zone
    // offset can still put that boundary's epoch above `start` (a ts in
    // the last local hours of the prior bucket) — step back once
    if (boundary(mi) > start) mi -= stepMonths
    val buf = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    var b = boundary(mi)
    while (b < end) {
      buf += b -> (mi / stepMonths).toLong
      mi += stepMonths
      b = boundary(mi)
    }
    buf.toList
  }

  /** The `auto` downsample ladder: query duration → snap interval, the
   *  upstream TSDB 3.x DownsampleFactory mechanism (interval "auto"
   *  resolves against the factory's ordered duration→interval table
   *  before the node plans; the reference repo ships only the storage
   *  source that consumes the already-resolved config). The TABLE is
   *  deployment config upstream; this is our documented default —
   *  roughly one-to-few hundred output buckets per series at every
   *  rung. Ordered largest-threshold-first; the first rung whose
   *  threshold the duration reaches wins. */
  val AutoLadder: Seq[(Long, String)] = Seq(
    14L * 86400 -> "1d", // >= 2w  → daily
    3L * 86400 -> "6h", // >= 3d  → 6-hourly
    86400L -> "1h", // >= 1d  → hourly
    6L * 3600 -> "15m", // >= 6h  → 15-minute
    3600L -> "5m" // >= 1h  → 5-minute
  )

  /** Resolve the `auto` interval for a query range of `rangeSec`
   *  seconds: the first ladder rung whose threshold the range reaches;
   *  shorter than every rung → "1m" (the ladder floor). */
  def autoInterval(rangeSec: Long): String =
    AutoLadder.collectFirst { case (t, iv) if rangeSec >= t => iv }
      .getOrElse("1m")

  /** UTC-offset segments of `zone` over [start, end): (fromEpochSec,
   *  offsetSec) pairs, ascending, first entry at `start`. Resolved ONCE
   *  on the driver from JVM ZoneRules at plan build; executors see only
   *  the literal CASE the query compiler folds these into — a query
   *  range crosses at most a handful of DST transitions, so the
   *  expression stays O(1) per row at any fact size. */
  /** The complete set of epoch bucket LABELS a timezone calendar-aligned
   *  downsample ([[graft.query.QueryEngine.tzBucket]]) can emit over
   *  [start, end): for each offset segment, the local-clock buckets its
   *  epoch span touches, each mapped back to epoch with the offset in
   *  effect at the bucket's LOCAL start (the tzBucket label rule; an
   *  ambiguous fall-back bucket resolves to the post-transition offset).
   *  Enumerating per segment — not one blind local sweep — keeps
   *  spring-forward phantom buckets (local times that never exist on the
   *  timeline) out of the grid, and the fall-back repeated hour dedupes
   *  to its single shared label. Driver-side, O(range/interval +
   *  transitions) — the same cardinality the dense grid materializes
   *  anyway, never a function of fact size. */
  def tzGridLabels(zone: String, iv: Long, start: Long, end: Long): Seq[Long] = {
    require(iv > 0, s"tz grid needs a positive finite interval, got $iv")
    val segs = zoneOffsets(zone, start, end)
    // the latest segment whose (transition + its offset) the local bucket
    // has reached — the identical fold tzBucket compiles to a literal CASE
    def labelOff(lb: Long): Long = segs.foldLeft(segs.head._2.toLong) {
      case (acc, (t, o)) => if (lb >= t + o) o.toLong else acc
    }
    val segEnds = segs.drop(1).map(_._1) :+ end
    val labels = scala.collection.mutable.SortedSet.empty[Long]
    segs.zip(segEnds).foreach { case ((segStart, off), segEnd) =>
      val localLo = segStart + off
      val localHi = segEnd + off // exclusive
      var lb = localLo - Math.floorMod(localLo, iv)
      while (lb < localHi) {
        labels += lb - labelOff(lb)
        lb += iv
      }
    }
    labels.toList
  }

  def zoneOffsets(zone: String, start: Long, end: Long): Seq[(Long, Int)] = {
    val rules = java.time.ZoneId.of(zone).getRules
    val buf = scala.collection.mutable.ListBuffer[(Long, Int)](
      start -> rules.getOffset(java.time.Instant.ofEpochSecond(start)).getTotalSeconds)
    var t = rules.nextTransition(java.time.Instant.ofEpochSecond(start))
    while (t != null && t.getInstant.getEpochSecond < end) {
      buf += t.getInstant.getEpochSecond -> t.getOffsetAfter.getTotalSeconds
      t = rules.nextTransition(t.getInstant)
    }
    buf.toList
  }
}
