package graft.filters

import graft.Fixtures
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Filter-tree compilation semantics (reference QueryBuilderTSDBExtTest /
 *  NewDocStore filter scenarios). */
class SeriesFilterSpec extends AnyFunSuite {

  // four series with varying tag shapes; one series lacks `colo` entirely
  private val df = Fixtures.points(
    ("cpu", Map("host" -> "web01", "colo" -> "den"), 0L, 1.0, 0L),
    ("cpu", Map("host" -> "web02", "colo" -> "sjc"), 0L, 1.0, 1L),
    ("mem", Map("host" -> "db01", "colo" -> "den", "env" -> "prod"), 0L, 1.0, 2L),
    ("disk", Map("host" -> "web03"), 0L, 1.0, 3L))

  private def hosts(f: SeriesFilter): Set[String] =
    df.filter(SeriesFilter.compile(f, col("metric"), col("tags")))
      .select(col("tags")("host")).collect().map(_.getString(0)).toSet

  test("literal / regex / wildcard tag filters") {
    assert(hosts(TagLiteral("host", Seq("web01", "db01"))) === Set("web01", "db01"))
    assert(hosts(TagRegexp("host", "web0[12]")) === Set("web01", "web02"))
    assert(hosts(TagWildcard("host", "web*")) === Set("web01", "web02", "web03"))
    assert(hosts(TagRegexp("host", ".*")) === Set("web01", "web02", "db01", "web03"),
      ".* must hit the match-all fast path")
  }

  test("metric filters") {
    assert(hosts(MetricLiteral(Seq("cpu"))) === Set("web01", "web02"))
    assert(hosts(MetricRegexp("^(cpu|mem)$")) === Set("web01", "web02", "db01"))
  }

  test("tag-key presence and any-match") {
    assert(hosts(TagKeyLiteral(Seq("env"))) === Set("db01"))
    assert(hosts(TagKeyRegexp("^co")) === Set("web01", "web02", "db01"))
    assert(hosts(AnyMatch("prod")) === Set("db01"))
    assert(hosts(AnyMatch("den")) === Set("web01", "db01"))
  }

  test("chain AND / OR combinations") {
    assert(hosts(Chain.and(MetricLiteral(Seq("cpu")), TagLiteral("colo", Seq("den")))) ===
      Set("web01"))
    assert(hosts(Chain.or(TagLiteral("colo", Seq("sjc")), TagKeyLiteral(Seq("env")))) ===
      Set("web02", "db01"))
  }

  test("NOT matches series that lack the tag key (reference andNot semantics)") {
    // disk/web03 has no colo tag: NOT(colo=den) must still match it
    assert(hosts(Not(TagLiteral("colo", Seq("den")))) === Set("web02", "web03"))
    assert(hosts(Chain.and(MatchAll, Not(TagRegexp("colo", "sjc|den")))) === Set("web03"))
  }

  test("explicit tags: tag count must equal the filter's positive key count") {
    val f = Chain.and(TagLiteral("host", Seq("web01", "web02", "db01", "web03")),
      TagKeyLiteral(Seq("colo")))
    val both = df.filter(
      SeriesFilter.compile(f, col("metric"), col("tags")) &&
        SeriesFilter.explicitTagsPredicate(f, col("tags")))
      .select(col("tags")("host")).collect().map(_.getString(0)).toSet
    // filter references {host, colo} ⇒ only the 2-tag series qualify
    assert(both === Set("web01", "web02"))
  }

  test("glob → regex conversion") {
    assert(SeriesFilter.globToRegex("web*") === "web.*")
    assert(SeriesFilter.globToRegex("*01*") === ".*01.*")
  }
}
