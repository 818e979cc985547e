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
}
