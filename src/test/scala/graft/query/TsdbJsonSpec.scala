package graft.query

import graft.filters._
import org.scalatest.funsuite.AnyFunSuite

/** The OpenTSDB query-JSON → filter-IR conversion, porting the
 *  reference's QueryBuilderTSDBExtTest.java scenarios (NOT-over-regex,
 *  ExplicitTags-over-chain, wildcard rewrite) plus the full-query
 *  config parse. */
class TsdbJsonSpec extends AnyFunSuite {

  // QueryBuilderTSDBExtTest.foobar: NOT over a tag-value regex
  test("NOT over TagValueRegex parses to Not(TagRegexp)") {
    val p = TsdbJson.parseFilter(
      """{"type": "Not", "filter":
           {"type": "TagValueRegex", "tagKey": "host", "filter": "foo"}}""")
    assert(p.filter === Not(TagRegexp("host", "foo")))
    assert(!p.explicitTags)
    // the reference counts tag keys of TagValue filters even under NOT
    // (QueryBuilderTSDBExt.java:89 adds before the operator branch)
    assert(p.tagCount === 1)
  }

  // QueryBuilderTSDBExtTest.foo: ExplicitTags over a mixed AND chain
  test("ExplicitTags over chain: flag set, literal-or pipe-split, nested chain defaults to AND") {
    val p = TsdbJson.parseFilter(
      """{"type": "ExplicitTags", "filter":
           {"type": "Chain", "op": "AND", "filters": [
             {"type": "TagValueLiteralOr", "tagKey": "_aggregate", "filter": "SUM"},
             {"type": "Chain", "filters": [
               {"type": "TagValueLiteralOr", "tagKey": "namespace", "filter": "Yamas|Foo"}]},
             {"type": "TagValueRegex", "tagKey": "hostgroup", "filter": ".*"}]}}""")
    assert(p.explicitTags)
    assert(p.tagCount === 3)
    val Chain(Chain.And, members) = p.filter
    assert(members(0) === TagLiteral("_aggregate", Seq("SUM")))
    assert(members(1) === Chain(Chain.And, Seq(TagLiteral("namespace", Seq("Yamas", "Foo")))))
    assert(members(2) === TagRegexp("hostgroup", ".*"))
  }

  // QueryBuilderTSDBExtTest.testWildcardFilter: '*' → '.*'
  test("wildcard filter rewrites * to .* (at compile time)") {
    val p = TsdbJson.parseFilter(
      """{"type": "TagValueWildcard", "tagKey": "key", "filter": "VAL*"}""")
    assert(p.filter === TagWildcard("key", "VAL*"))
    assert(SeriesFilter.globToRegex("VAL*") === "VAL.*")
    assert(p.tagCount === 1)
  }

  test("metric / tag-key / any-field filters and the 'key' field alias") {
    val p = TsdbJson.parseFilter(
      """{"type": "Chain", "op": "OR", "filters": [
           {"type": "MetricLiteral", "metric": "sys.cpu|sys.mem"},
           {"type": "MetricRegex", "metric": "^net\\."},
           {"type": "TagKeyLiteralOr", "filter": "host|colo"},
           {"type": "TagKeyRegex", "filter": "^h"},
           {"type": "AnyFieldRegex", "filter": "web"},
           {"type": "TagValueLiteralOr", "key": "user", "filter": "1"}]}""")
    val Chain(Chain.Or, ms) = p.filter
    assert(ms(0) === MetricLiteral(Seq("sys.cpu", "sys.mem")))
    assert(ms(1) === MetricRegexp("^net\\."))
    assert(ms(2) === TagKeyLiteral(Seq("host", "colo")))
    assert(ms(3) === TagKeyRegexp("^h"))
    assert(ms(4) === AnyMatch("web"))
    assert(ms(5) === TagLiteral("user", Seq("1")))
    assert(p.tagCount === 1) // only the TagValue filter contributes
  }

  test("unsupported filter type raises, like the reference's UnsupportedOperationException") {
    val e = intercept[IllegalArgumentException] {
      TsdbJson.parseFilter("""{"type": "FieldLiteralOr", "filter": "x"}""")
    }
    assert(e.getMessage.contains("Unsupported"))
  }

  test("malformed wrappers fail with a clear message, not an NPE") {
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseFilter("""{"type": "Not"}""")
    }.getMessage.contains("nested 'filter'"))
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseFilter("""{"type": "ExplicitTags"}""")
    }.getMessage.contains("nested 'filter'"))
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseFilter("""{"filter": "x"}""")
    }.getMessage.contains("missing 'type'"))
  }

  test("full query JSON: range + filter + downsample + rate + groupBy + shift") {
    val q = TsdbJson.parseQuery(
      """{"start": 100, "end": 200,
          "filter": {"type": "ExplicitTags", "filter":
            {"type": "TagValueLiteralOr", "tagKey": "host", "filter": "web01"}},
          "downsample": {"interval": "1h", "aggregator": "avg",
                         "infectiousNan": true, "reportingInterval": "60s"},
          "rate": {"counter": true, "counterMax": 500.0, "dropResets": true},
          "groupBy": {"tagKeys": ["host", "colo"], "aggregator": "sum"},
          "timeShift": "1w"}""")
    assert(q === TsdbQuery(
      filter = TagLiteral("host", Seq("web01")),
      start = 100L, end = 200L,
      downsample = Some(DownsampleSpec("1h", "avg",
        infectiousNan = true, reportingInterval = Some("60s"))),
      rate = Some(RateSpec(counter = true, counterMax = 500.0, dropResets = true)),
      groupBy = Some(GroupBySpec(Seq("host", "colo"), "sum")),
      shift = Some("1w"),
      explicitTags = true))
  }

  test("analytic nodes: slidingWindow + topN parse; absent/null means none; bad configs raise") {
    val q = TsdbJson.parseQuery(
      """{"start": 1, "end": 2,
          "slidingWindow": {"buckets": 3, "aggregator": "avg"},
          "topN": {"n": 5, "top": false}}""")
    assert(q.slidingWindow === Some(SlidingWindowSpec(3, "avg")))
    assert(q.topN === Some(TopNSpec(5, top = false)))
    // "count" alias for n; top defaults to true (largest first)
    val q2 = TsdbJson.parseQuery("""{"start": 1, "end": 2, "topN": {"count": 2}}""")
    assert(q2.topN === Some(TopNSpec(2, top = true)))
    val none = TsdbJson.parseQuery(
      """{"start": 1, "end": 2, "slidingWindow": null, "topN": null}""")
    assert(none.slidingWindow.isEmpty && none.topN.isEmpty)
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": 1, "end": 2, "slidingWindow": {"aggregator": "avg"}}""")
    }.getMessage.contains("buckets"))
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": 1, "end": 2, "topN": {"top": true}}""")
    }.getMessage.contains("'n'"))
  }

  test("analytic nodes: ratio + summarizer parse; summaries list or single aggregator; bad configs raise") {
    val q = TsdbJson.parseQuery(
      """{"start": 1, "end": 2,
          "ratio": {"asPercent": false},
          "summarizer": {"summaries": ["avg", "max", "count"]}}""")
    assert(q.ratio === Some(RatioSpec(asPercent = false)))
    assert(q.summarizer === Some(SummarizerSpec(Seq("avg", "max", "count"))))
    // asPercent defaults true; single-aggregator form
    val q2 = TsdbJson.parseQuery(
      """{"start": 1, "end": 2, "ratio": {}, "summarizer": {"aggregator": "last"}}""")
    assert(q2.ratio === Some(RatioSpec(asPercent = true)))
    assert(q2.summarizer === Some(SummarizerSpec(Seq("last"))))
    val none = TsdbJson.parseQuery(
      """{"start": 1, "end": 2, "ratio": null, "summarizer": null}""")
    assert(none.ratio.isEmpty && none.summarizer.isEmpty)
    // fill config: policy + scalar; defaults nan/0.0
    val f = TsdbJson.parseQuery(
      """{"start": 1, "end": 2, "fill": {"policy": "scalar", "scalar": -1.5}}""")
    assert(f.fill === Some(FillSpec("scalar", -1.5)))
    assert(TsdbJson.parseQuery("""{"start": 1, "end": 2, "fill": {}}""").fill
      === Some(FillSpec("nan", 0.0)))
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": 1, "end": 2, "summarizer": {}}""")
    }.getMessage.contains("summarizer"))
  }

  test("bucketQuantile node parses: quantiles + cumulative flag; bad configs raise") {
    val q = TsdbJson.parseQuery(
      """{"start": 1, "end": 2,
          "bucketQuantile": {"quantiles": [0.5, 0.95, 0.99]}}""")
    assert(q.bucketQuantile === Some(BucketQuantileSpec(Seq(0.5, 0.95, 0.99))))
    val cum = TsdbJson.parseQuery(
      """{"start": 1, "end": 2,
          "bucketQuantile": {"quantiles": [0.9], "cumulative": true}}""")
    assert(cum.bucketQuantile === Some(BucketQuantileSpec(Seq(0.9), cumulative = true)))
    assert(TsdbJson.parseQuery("""{"start": 1, "end": 2}""").bucketQuantile.isEmpty)
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": 1, "end": 2, "bucketQuantile": {}}""")
    }.getMessage.contains("quantiles"))
    intercept[IllegalArgumentException] {
      TsdbJson.parseQuery(
        """{"start": 1, "end": 2, "bucketQuantile": {"quantiles": [1.5]}}""")
    }
  }

  test("timeDifference validates its unit at parse time; rate+timeDifference is rejected by run()") {
    // eager: the malformed document fails AT PARSE with an attributable
    // message, never later mid-plan-build
    assert(intercept[IllegalArgumentException] {
      TsdbJson.parseQuery(
        """{"start": 1, "end": 2, "timeDifference": {"unit": "days"}}""")
    }.getMessage.contains("days"))
    intercept[IllegalArgumentException] { TimeDifferenceSpec("fortnights") }
    assert(TimeDifferenceSpec("Hours").unitSeconds === 3600L)
    // rate and timeDifference both rewrite the raw stream — composing
    // them has no defined upstream meaning and the engine refuses
    val both = TsdbQuery(MatchAll, 0L, 10L,
      rate = Some(RateSpec()), timeDifference = Some(TimeDifferenceSpec()))
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val pts = Seq((1L, "m", 1L, 1.0, 1L))
      .toDF("series_id", "metric", "ts", "value", "seq")
      .withColumn("tags", org.apache.spark.sql.functions.map())
    assert(intercept[IllegalArgumentException] {
      QueryEngine.run(pts, both)
    }.getMessage.contains("not both"))
  }

  test("events query JSON: range + text + namespace + dims") {
    val q = TsdbJson.parseEventsQuery(
      """{"start": 10, "end": 20, "query": "disk fail*",
          "namespace": "ops", "dims": {"host": "web01", "colo": "sjc"}}""")
    assert(q === graft.events.EventsQuery(10L, 20L,
      text = Some("disk fail*"), namespace = Some("ops"),
      dims = Map("host" -> "web01", "colo" -> "sjc")))
    // minimal form: range only
    assert(TsdbJson.parseEventsQuery("""{"start": 1, "end": 2}""") ===
      graft.events.EventsQuery(1L, 2L))
  }

  test("query defaults: no filter means MatchAll; 0all interval implies runAll") {
    val q = TsdbJson.parseQuery(
      """{"start": 1, "end": 2, "downsample": {"interval": "0all", "aggregator": "sum"}}""")
    assert(q.filter === MatchAll)
    assert(q.downsample.get.runAll)
    assert(!q.explicitTags)
  }

  test("events request JSON: groupBy/fetchLast, downsample, from/size; defaults are plain search") {
    val g = TsdbJson.parseEventsRequest(
      """{"start": 1, "end": 2, "groupBy": "host", "fetchLast": true}""")
    assert(g.groupBy === Some("host") && g.fetchLast && !g.downsample)
    val d = TsdbJson.parseEventsRequest(
      """{"start": 1, "end": 2, "namespace": "view", "downsample": true}""")
    assert(d.downsample && d.query.namespace === Some("view"))
    val p = TsdbJson.parseEventsRequest(
      """{"start": 1, "end": 2, "from": 25, "size": 50}""")
    assert(p.from === 25 && p.size === Some(50))
    val plain = TsdbJson.parseEventsRequest("""{"start": 1, "end": 2}""")
    assert(plain.groupBy.isEmpty && !plain.downsample && plain.size.isEmpty && plain.from === 0)
    // an explicit JSON null field means absent, not the string "null"
    val nulled = TsdbJson.parseEventsRequest(
      """{"start": 1, "end": 2, "query": null, "groupBy": null}""")
    assert(nulled.query.text.isEmpty && nulled.groupBy.isEmpty)
  }

  test("meta query JSON: type dispatch fields; TAG_VALUES needs aggregationField; null tagKey rejected") {
    val m = TsdbJson.parseMetaQuery(
      """{"type": "TAG_VALUES", "aggregationField": "host", "size": 10,
          "filter": {"type": "TagValueLiteralOr", "tagKey": "colo", "filter": "sjc"}}""")
    assert(m.metaType === "TAG_VALUES" && m.aggregationField === Some("host") && m.size === 10)
    assert(m.filter === TagLiteral("colo", Seq("sjc")))
    val keys = TsdbJson.parseMetaQuery("""{"type": "tag_keys"}""")
    assert(keys.metaType === "TAG_KEYS" && keys.filter === MatchAll
      && keys.size === graft.meta.MetaQueries.SizeLimit)
    intercept[IllegalArgumentException] {
      TsdbJson.parseMetaQuery("""{"filter": {"type": "AnyFieldRegex", "filter": "x"}}""")
    }
    // str(): a null-valued required field hits the clear require message
    val e = intercept[IllegalArgumentException] {
      TsdbJson.parseFilter("""{"type": "TagValueLiteralOr", "tagKey": null, "filter": "a"}""")
    }
    assert(e.getMessage.contains("missing 'tagKey'"))
  }

  test("expression graph: named subqueries inherit top-level range; malformed docs raise") {
    val g = TsdbJson.parseExpressionGraph("""{
      "start": 100, "end": 200,
      "queries": [
        {"id": "a", "downsample": {"interval": "1d", "aggregator": "sum"},
         "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}},
        {"id": "b", "start": 50, "end": 150,
         "downsample": {"interval": "1d", "aggregator": "sum"},
         "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}}
      ],
      "expression": "a / b"}""")
    assert(g.expression === "a / b")
    val byId = g.queries.toMap
    // a inherits the top-level range; b keeps its own
    assert(byId("a").start === 100L && byId("a").end === 200L)
    assert(byId("b").start === 50L && byId("b").end === 150L)
    // movingAverage parses alongside the other analytic nodes
    val ma = TsdbJson.parseQuery("""{
      "start": 1, "end": 2,
      "downsample": {"interval": "1d", "aggregator": "count"},
      "movingAverage": {"samples": 4, "alpha": 0.25}}""")
    assert(ma.movingAverage === Some(MovingAverageSpec(4, 0.25)))
    // anomaly node: model-specific defaults resolve (zscore 3.0/3,
    // olympic 0.5/2), explicit values win
    val az = TsdbJson.parseQuery("""{
      "start": 1, "end": 2,
      "downsample": {"interval": "1d", "aggregator": "count"},
      "anomaly": {"model": "zscore"}}""").anomaly.get
    assert(az.resolvedThreshold === 3.0 && az.resolvedMinHistory === 3)
    val ao = TsdbJson.parseQuery("""{
      "start": 1, "end": 2,
      "downsample": {"interval": "1d", "aggregator": "count"},
      "anomaly": {"model": "olympic", "threshold": 0.7, "period": 3}}""").anomaly.get
    assert(ao.resolvedThreshold === 0.7 && ao.resolvedMinHistory === 2 && ao.period === 3)
    // olympic × timezone (round 11): the seasonal position indexes on
    // the LOCAL clock — hourly buckets at Denver local hour 5 on four
    // consecutive days across the 2024 spring-forward stay ONE seasonal
    // slot (period 24), so the Mar-11 bucket's baseline is the plain
    // mean of its three same-local-hour predecessors. A raw epoch index
    // would put the post-DST buckets (11:00 UTC) in a different slot
    // than the pre-DST ones (12:00 UTC) and emit a null baseline.
    val tzOly = TsdbJson.parseQuery("""{
      "start": 1709881200, "end": 1710223200,
      "downsample": {"interval": "1h", "aggregator": "sum",
                     "timezone": "America/Denver"},
      "anomaly": {"model": "olympic", "period": 24, "minHistory": 2}}""")
    val tzPts = graft.Fixtures.series("m", Map("h" -> "a"),
      (1709899200L, 1.0), // Mar  8 05:00 MST (12:00 UTC)
      (1709985600L, 2.0), // Mar  9 05:00 MST (12:00 UTC)
      (1710068400L, 3.0), // Mar 10 05:00 MDT (11:00 UTC) — post-transition
      (1710154800L, 4.0)) // Mar 11 05:00 MDT (11:00 UTC)
    val oly = QueryEngine.run(tzPts, tzOly)
      .select("bucket_ts", "baseline").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(oly(1710154800L) === Some(2.0),
      "Mar-11 local-hour-5 baseline must average its three local-hour-5 predecessors")
    assert(oly(1710068400L) === Some(1.5),
      "the first post-DST bucket still sees its two pre-DST same-slot predecessors")
    intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": 1, "end": 2, "movingAverage": {}}""")
    }
    intercept[IllegalArgumentException] {
      TsdbJson.parseExpressionGraph("""{"queries": [], "expression": "a / b"}""")
    }
    intercept[IllegalArgumentException] {
      TsdbJson.parseExpressionGraph("""{
        "start": 1, "end": 2,
        "queries": [{"id": "a"}, {"id": "a"}], "expression": "a / a"}""")
    }
    intercept[IllegalArgumentException] {
      TsdbJson.parseExpressionGraph("""{
        "start": 1, "end": 2,
        "queries": [{"id": "a"}, {"nope": true}], "expression": "a / b"}""")
    }
  }

  test("expression graph executes: per-id filters, boundary rounding, divide semantics") {
    val pts = graft.Fixtures.points(
      ("err", Map("user" -> "1"), 10L, 2.0, 1L),
      ("err", Map("user" -> "1"), 20L, 1.0, 2L),
      ("clk", Map("user" -> "1"), 30L, 4.0, 3L),
      ("clk", Map("user" -> "2"), 40L, 8.0, 4L)) // no err side → drops (intersection)
    val g = TsdbJson.parseExpressionGraph("""{
      "start": 0, "end": 86400,
      "queries": [
        {"id": "e", "filter": {"type": "MetricLiteral", "metric": "err"},
         "downsample": {"interval": "1d", "aggregator": "sum"},
         "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}},
        {"id": "c", "filter": {"type": "MetricLiteral", "metric": "clk"},
         "downsample": {"interval": "1d", "aggregator": "sum"},
         "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}}
      ],
      "expression": "e / c"}""")
    val out = QueryEngine.runExpressionGraph(pts, g)
      .select("user", "bucket_ts", "value").collect()
    assert(out.length === 1) // user 2 has no err series — intersection drops it
    assert(out(0).getString(0) === "1" && out(0).getLong(1) === 0L)
    assert(out(0).getDouble(2) === 3.0 / 4.0)
    // unknown id and missing groupBy fail the config, not the plan
    intercept[IllegalArgumentException] {
      QueryEngine.runExpressionGraph(pts, g.copy(expression = "e / zz"))
    }
    intercept[IllegalArgumentException] {
      QueryEngine.runExpressionGraph(pts, g.copy(expression = "e %% c"))
    }
    intercept[IllegalArgumentException] {
      QueryEngine.runExpressionGraph(pts,
        g.copy(queries = g.queries.map { case (id, q) => id -> q.copy(groupBy = None) }))
    }
  }

  test("relative time grammar: now/<n><unit>-ago against a caller-supplied now; pure parse") {
    val now = 1706140800L
    val q = TsdbJson.parseQuery(
      """{"start": "20d-ago", "end": "now"}""", now)
    assert(q.start === now - 20L * 86400)
    assert(q.end === now)
    // digit strings stay absolute; mixed forms compose
    val q2 = TsdbJson.parseQuery("""{"start": "1704412800", "end": "1h-ago"}""", now)
    assert(q2.start === 1704412800L && q2.end === now - 3600)
    // relative WITHOUT a now must fail loudly, not read a wall clock
    val e = intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": "20d-ago", "end": 1706140800}""")
    }
    assert(e.getMessage.contains("now"))
    intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": "yesterday", "end": "now"}""", now)
    }
    // bad relative unit surfaces the interval-grammar error
    intercept[IllegalArgumentException] {
      TsdbJson.parseQuery("""{"start": "5x-ago", "end": "now"}""", now)
    }
    // expression graphs inherit textual relative times intact
    val g = TsdbJson.parseExpressionGraph(
      """{"start": "2d-ago", "end": "now",
         "queries": [
           {"id": "e", "filter": {"type": "MetricLiteral", "metric": "error"},
            "downsample": {"interval": "1d", "aggregator": "sum"},
            "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}},
           {"id": "c", "filter": {"type": "MetricLiteral", "metric": "click"},
            "downsample": {"interval": "1d", "aggregator": "sum"},
            "groupBy": {"tagKeys": ["user"], "aggregator": "sum"}}],
         "expression": "e / c"}""", now)
    assert(g.queries.forall { case (_, q) =>
      q.start === now - 2L * 86400 && q.end === now })
  }
}
