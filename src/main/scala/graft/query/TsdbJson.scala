package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.filters._

import scala.jdk.CollectionConverters._

/**
 * OpenTSDB semantic-query JSON front end: parses the TSDB 3.x
 * `QueryFilter` JSON tree (type-discriminated nodes: Chain / Not /
 * ExplicitTags / TagValueLiteralOr / TagValueRegex / TagValueWildcard /
 * MetricLiteral / MetricRegex / TagKeyLiteralOr / TagKeyRegex /
 * AnyFieldRegex) into the [[graft.filters.SeriesFilter]] IR — the same
 * conversion the reference performs in
 * QueryBuilderTSDBExt.java:48-122 (`fromTSDBQueryFilter`): ExplicitTags
 * unwraps and sets the exact-match flag (:52-56), Chain maps member-wise
 * (:67-81), Not pushes a NOT operator onto its child (:82-86), literal-or
 * values split on `|`, and wildcards rewrite `*` → `.*` (:105-114).
 *
 * [[parseQuery]] additionally reads the pushed-down query-node configs the
 * reference absorbs into its source node (time range + downsample + rate +
 * groupBy + timeShift, AuraMetricsSourceFactory.java:120-128) so a client
 * query replays through [[QueryEngine.run]] unchanged.
 */
object TsdbJson {

  /** Filter + the two builder outputs the reference derives alongside it:
   *  the explicit-tags flag (top-level ExplicitTagsFilter) and the count
   *  of distinct tag keys referenced by TagValue filters — including
   *  NOT-negated ones, matching QueryBuilderTSDBExt.java:89 (the engine's
   *  explicit-tags predicate counts positive keys only; the two agree on
   *  every query without a NOT over a tag-value term). */
  final case class ParsedFilter(filter: SeriesFilter, explicitTags: Boolean, tagCount: Int)

  private val mapper = new ObjectMapper()

  def parseFilter(json: String): ParsedFilter = filterFromNode(mapper.readTree(json))

  def filterFromNode(root: JsonNode): ParsedFilter = {
    val keys = scala.collection.mutable.Set.empty[String]
    val f = build(unwrapTop(root), keys)
    ParsedFilter(f, explicitTags = typeOf(root) == "explicittags", tagCount = keys.size)
  }

  /** Top-level ExplicitTags only sets the flag; the tree it wraps is the
   *  filter (reference :64-66 unwraps it wherever it appears). */
  private def unwrapTop(n: JsonNode): JsonNode =
    if (typeOf(n) == "explicittags") {
      val inner = n.get("filter")
      require(inner != null, s"ExplicitTags needs a nested 'filter': $n")
      inner
    } else n

  private def typeOf(n: JsonNode): String = {
    val t = n.get("type")
    require(t != null, s"filter node missing 'type': $n")
    t.asText.toLowerCase
  }

  private def str(n: JsonNode, field: String, alt: String = null): String = {
    // an explicit JSON null is "missing", not the string "null" (Jackson
    // returns NullNode whose asText is "null") — route it to the clear
    // require message instead of building a filter on a phantom value
    val v = Option(n.get(field)).filter(!_.isNull)
      .orElse(Option(alt).flatMap(a => Option(n.get(a)).filter(!_.isNull)))
    require(v.isDefined, s"filter node missing '$field': $n")
    v.get.asText
  }

  private def pipeSplit(s: String): Seq[String] =
    s.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)

  private def build(n: JsonNode, tagKeys: scala.collection.mutable.Set[String]): SeriesFilter =
    typeOf(n) match {
      case "explicittags" => // nested: just unwrap (reference :64-66)
        val inner = n.get("filter")
        require(inner != null, s"ExplicitTags needs a nested 'filter': $n")
        build(inner, tagKeys)
      case "chain" =>
        val op = Option(n.get("op")).map(_.asText.toUpperCase).getOrElse("AND") match {
          case "AND" => Chain.And
          case "OR" => Chain.Or
          case other => throw new IllegalArgumentException(s"unsupported chain op $other")
        }
        val members = Option(n.get("filters")).map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
        Chain(op, members.map(build(_, tagKeys)))
      case "not" =>
        val inner = n.get("filter")
        require(inner != null, s"Not needs a nested 'filter': $n")
        Not(build(inner, tagKeys))
      case "tagvalueliteralor" =>
        val k = str(n, "tagKey", "key"); tagKeys += k
        TagLiteral(k, pipeSplit(str(n, "filter")))
      case "tagvalueregex" =>
        val k = str(n, "tagKey", "key"); tagKeys += k
        TagRegexp(k, str(n, "filter"))
      case "tagvaluewildcard" =>
        val k = str(n, "tagKey", "key"); tagKeys += k
        TagWildcard(k, str(n, "filter"))
      case "metricliteral" =>
        MetricLiteral(pipeSplit(str(n, "metric", "filter")))
      case "metricregex" =>
        MetricRegexp(str(n, "metric", "filter"))
      case "tagkeyliteralor" | "tagkeyliteral" =>
        TagKeyLiteral(pipeSplit(str(n, "filter")))
      case "tagkeyregex" =>
        TagKeyRegexp(str(n, "filter"))
      case "anyfieldregex" =>
        AnyMatch(str(n, "filter"))
      case other =>
        throw new IllegalArgumentException(s"Unsupported QueryFilter type '$other'")
    }

  // ------------------------------------------------------------ full query

  /** Parse a pushed-down source-node query: `start`/`end` epoch seconds,
   *  optional `filter` tree, optional `downsample` / `rate` / `groupBy` /
   *  `timeShift` configs (field names follow the TSDB query-node configs
   *  the reference absorbs, AuraMetricsSourceFactory.java:120-128). */
  def parseQuery(json: String): TsdbQuery = queryFromNode(mapper.readTree(json))

  /** As [[parseQuery]], with OpenTSDB's RELATIVE time grammar enabled:
   *  `start`/`end` may be `"now"` or `"<n><unit>-ago"` (s/m/h/d/w — the
   *  interval grammar), resolved against the CALLER-SUPPLIED `now`.
   *  `now` is a parameter, not wall-clock, so a parsed query is a pure
   *  value — the same document replays identically in a test, an oracle
   *  compare, or a backfill; a serving layer passes its own clock. */
  def parseQuery(json: String, now: Long): TsdbQuery =
    queryFromNode(mapper.readTree(json), Some(now))

  /** Parse a multi-source expression document (the upstream semantic-
   *  query shape): top-level `start`/`end` shared by every subquery,
   *  `queries`: [{"id": "e", …query fields…}, …], and `expression`:
   *  `"e / c"` (id op id over `+ - * /`). Subqueries inherit the
   *  top-level time range unless they carry their own. */
  def parseExpressionGraph(json: String): ExpressionGraph =
    parseExpressionGraph(json, None)

  /** As [[parseExpressionGraph]] with the relative-time grammar enabled
   *  (see `parseQuery(json, now)`): top-level or per-subquery
   *  `start`/`end` may be `"now"` / `"<n><unit>-ago"`, resolved against
   *  the caller-supplied `now`. */
  def parseExpressionGraph(json: String, now: Long): ExpressionGraph =
    parseExpressionGraph(json, Some(now))

  private def parseExpressionGraph(json: String, now: Option[Long]): ExpressionGraph = {
    val n = mapper.readTree(json)
    val qsNode = n.get("queries")
    require(qsNode != null && qsNode.isArray && qsNode.size >= 2,
      s"expression graph needs >= 2 named 'queries': $json")
    val exprNode = n.get("expression")
    require(exprNode != null && !exprNode.isNull, s"expression graph needs 'expression': $json")
    val qs = qsNode.elements.asScala.map { q0 =>
      val id = Option(q0.get("id")).filter(!_.isNull)
        .map(_.asText).getOrElse(
          throw new IllegalArgumentException(s"subquery needs 'id': $q0"))
      val q = q0.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      Seq("start", "end").foreach { f =>
        if (!q.has(f)) {
          require(n.has(f), s"subquery '$id' and top level both missing '$f'")
          // copy the raw node: a textual relative time ("1h-ago") must
          // reach the subquery parse intact, not collapse to asLong=0
          // (set's return type parameter must be pinned — inference
          // from a discarded value picks T=Unit and casts at runtime)
          q.set[JsonNode](f, n.get(f))
        }
      }
      id -> queryFromNode(q, now)
    }.toSeq
    require(qs.map(_._1).distinct.size == qs.size, "duplicate subquery ids")
    ExpressionGraph(qs, exprNode.asText)
  }

  /** Resolve a `start`/`end` field: epoch-second number (or digit
   *  string), or — when `now` is supplied — `"now"` / `"<n><unit>-ago"`.
   *  Relative forms without a `now` fail loudly: resolution against an
   *  implicit wall clock would make parsing nondeterministic. */
  private def timeField(n: JsonNode, field: String, now: Option[Long]): Long = {
    val v = n.get(field)
    if (v.isNumber) v.asLong
    else v.asText match {
      case t if t.nonEmpty && t.forall(_.isDigit) => t.toLong
      case "now" => now.getOrElse(throw new IllegalArgumentException(
        s"'$field': \"now\" needs a caller-supplied now (parseQuery(json, now))"))
      case t if t.endsWith("-ago") =>
        val base = now.getOrElse(throw new IllegalArgumentException(
          s"'$field': relative time \"$t\" needs a caller-supplied now (parseQuery(json, now))"))
        base - graft.core.Intervals.toSeconds(t.dropRight(4))
      case other => throw new IllegalArgumentException(
        s"'$field': expected epoch seconds, \"now\", or \"<n><unit>-ago\", got \"$other\"")
    }
  }

  def queryFromNode(n: JsonNode): TsdbQuery = queryFromNode(n, None)

  def queryFromNode(n: JsonNode, now: Option[Long]): TsdbQuery = {
    require(n.has("start") && n.has("end"), s"query needs start/end: $n")
    val pf = Option(n.get("filter")).map(filterFromNode)
      .getOrElse(ParsedFilter(MatchAll, explicitTags = false, 0))
    val ds = Option(n.get("downsample")).map { d =>
      DownsampleSpec(
        interval = str(d, "interval"),
        agg = str(d, "aggregator", "agg"),
        runAll = Option(d.get("runAll")).exists(_.asBoolean) ||
          Option(d.get("interval")).exists(_.asText == "0all"),
        infectiousNan = Option(d.get("infectiousNan")).exists(_.asBoolean),
        reportingInterval = Option(d.get("reportingInterval")).map(_.asText),
        timezone = Option(d.get("timezone")).filter(!_.isNull).map(_.asText))
    }
    val rate = Option(n.get("rate")).map { r =>
      RateSpec(
        interval = Option(r.get("interval")).map(_.asText).getOrElse("1s"),
        counter = Option(r.get("counter")).exists(_.asBoolean),
        dropResets = Option(r.get("dropResets")).exists(_.asBoolean),
        counterMax = Option(r.get("counterMax")).map(_.asDouble).getOrElse(Long.MaxValue.toDouble),
        resetValue = Option(r.get("resetValue")).map(_.asDouble).getOrElse(0d),
        deltaOnly = Option(r.get("deltaOnly")).exists(_.asBoolean),
        rateToCount = Option(r.get("rateToCount")).exists(_.asBoolean))
    }
    val gb = Option(n.get("groupBy")).map { g =>
      GroupBySpec(
        keys = Option(g.get("tagKeys")).map(_.elements.asScala.map(_.asText).toSeq)
          .getOrElse(Seq.empty),
        agg = str(g, "aggregator", "agg"))
    }
    // upstream TSDB 3.x analytic nodes above the source output
    val sw = Option(n.get("slidingWindow")).filter(!_.isNull).map { s0 =>
      val b = Option(s0.get("buckets")).filter(!_.isNull)
      require(b.isDefined, s"slidingWindow needs 'buckets': $s0")
      SlidingWindowSpec(buckets = b.get.asInt, agg = str(s0, "aggregator", "agg"))
    }
    val ma = Option(n.get("movingAverage")).filter(!_.isNull).map { m =>
      val smp = Option(m.get("samples")).filter(!_.isNull)
      require(smp.isDefined, s"movingAverage needs 'samples': $m")
      MovingAverageSpec(samples = smp.get.asInt,
        alpha = Option(m.get("alpha")).filter(!_.isNull).map(_.asDouble).getOrElse(0.5),
        exponential = Option(m.get("exponential")).filter(!_.isNull).forall(_.asBoolean))
    }
    val td = Option(n.get("timeDifference")).filter(!_.isNull).map { t =>
      TimeDifferenceSpec(unit =
        Option(t.get("unit")).filter(!_.isNull).map(_.asText).getOrElse("seconds"))
    }
    val an = Option(n.get("anomaly")).filter(!_.isNull).map { a =>
      AnomalySpec(
        model = Option(a.get("model")).filter(!_.isNull).map(_.asText).getOrElse("zscore"),
        threshold = Option(a.get("threshold")).filter(!_.isNull).map(_.asDouble)
          .getOrElse(Double.NaN),
        minHistory = Option(a.get("minHistory")).filter(!_.isNull).map(_.asInt).getOrElse(0),
        period = Option(a.get("period")).filter(!_.isNull).map(_.asInt).getOrElse(7))
    }
    val tn = Option(n.get("topN")).filter(!_.isNull).map { t =>
      val cnt = Option(t.get("n")).filter(!_.isNull).orElse(Option(t.get("count")).filter(!_.isNull))
      require(cnt.isDefined, s"topN needs 'n': $t")
      TopNSpec(n = cnt.get.asInt,
        top = Option(t.get("top")).filter(!_.isNull).forall(_.asBoolean),
        agg = Option(t.get("aggregator")).filter(!_.isNull).map(_.asText).getOrElse("sum"))
    }
    val fl = Option(n.get("fill")).filter(!_.isNull).map { f =>
      FillSpec(
        policy = Option(f.get("policy")).filter(!_.isNull).map(_.asText).getOrElse("nan"),
        scalar = Option(f.get("scalar")).filter(!_.isNull).map(_.asDouble).getOrElse(0.0),
        real = Option(f.get("real")).filter(!_.isNull).map(_.asText))
    }
    val rt = Option(n.get("ratio")).filter(!_.isNull).map { r =>
      RatioSpec(asPercent =
        Option(r.get("asPercent")).filter(!_.isNull).forall(_.asBoolean))
    }
    val sm = Option(n.get("summarizer")).filter(!_.isNull).map { s0 =>
      val aggs = Option(s0.get("summaries")).filter(!_.isNull)
        .map(_.elements.asScala.map(_.asText).toSeq)
        .orElse(Option(s0.get("aggregator")).filter(!_.isNull).map(a => Seq(a.asText)))
      require(aggs.exists(_.nonEmpty), s"summarizer needs 'summaries' or 'aggregator': $s0")
      SummarizerSpec(aggs.get)
    }
    val bq = Option(n.get("bucketQuantile")).filter(!_.isNull).map { b =>
      val qs = Option(b.get("quantiles")).filter(!_.isNull)
        .map(_.elements.asScala.map(_.asDouble).toSeq)
      require(qs.exists(_.nonEmpty), s"bucketQuantile needs 'quantiles': $b")
      BucketQuantileSpec(qs.get,
        cumulative = Option(b.get("cumulative")).filter(!_.isNull).exists(_.asBoolean))
    }
    TsdbQuery(
      filter = pf.filter,
      start = timeField(n, "start", now),
      end = timeField(n, "end", now),
      downsample = ds,
      rate = rate,
      timeDifference = td,
      groupBy = gb,
      shift = Option(n.get("timeShift")).map(_.asText),
      explicitTags = pf.explicitTags,
      fill = fl,
      slidingWindow = sw,
      movingAverage = ma,
      anomaly = an,
      ratio = rt,
      topN = tn,
      summarizer = sm,
      bucketQuantile = bq)
  }

  /** Parse an events query document — the events domain's counterpart
   *  (reference: the TSDB events source config feeding the Lucene query
   *  builder, events-lucene/.../LuceneEventsQuery.java fields `groupBy` /
   *  `fetchLast` plus the free-text `query` the runner converts,
   *  QueryRunner.java convertToRegex): `start`/`end` epoch seconds,
   *  optional free-text `query`, `namespace`, and exact-match `dims`.
   *  Selection fields only; [[parseEventsRequest]] adds the execution
   *  shape (group / downsample / paging). */
  def parseEventsQuery(json: String): graft.events.EventsQuery =
    parseEventsRequest(json).query

  /** Parse a FULL events request: the selection ([[parseEventsQuery]])
   *  plus the execution-shape fields the reference's runner reads —
   *  `groupBy` + `fetchLast` (grouped search with optional latest-event
   *  merge, QueryRunner.java:174-268), `downsample` (per-minute
   *  hit-count buckets, QueryRunner.java:169-172), and `from`/`size`
   *  (sorted paging, QueryRunner.java:99-143). Dispatch through
   *  [[graft.events.EventsEngine.run]]. */
  def parseEventsRequest(json: String): graft.events.EventsRequest = {
    val n = mapper.readTree(json)
    require(n.has("start") && n.has("end"), s"events query needs start/end: $json")
    val opt = (f: String) => Option(n.get(f)).filter(!_.isNull)
    val q = graft.events.EventsQuery(
      start = n.get("start").asLong,
      end = n.get("end").asLong,
      text = opt("query").map(_.asText),
      namespace = opt("namespace").map(_.asText),
      dims = opt("dims").map { d =>
        d.fieldNames.asScala.map(k => k -> d.get(k).asText).toMap
      }.getOrElse(Map.empty))
    graft.events.EventsRequest(
      query = q,
      groupBy = opt("groupBy").map(_.asText),
      fetchLast = opt("fetchLast").exists(_.asBoolean),
      downsample = opt("downsample").exists(_.asBoolean),
      from = opt("from").map(_.asInt).getOrElse(0),
      size = opt("size").map(_.asInt))
  }

  /** Parse a meta query document (reference MetaQuery.java fields via
   *  MetaQueryBuilderTSDBExt.java:58-66: the type enum
   *  NAMESPACES/METRICS/TAG_KEYS/TAG_VALUES/TAG_KEYS_AND_VALUES/BASIC/
   *  TIMESERIES, an optional QueryFilter tree, the TAG_VALUES
   *  `aggregationField`, and the `size` cap defaulting to 1024,
   *  MetaQuery.java:30). Dispatch through
   *  [[graft.meta.MetaQueries.run]]. */
  def parseMetaQuery(json: String): graft.meta.MetaRequest = {
    val n = mapper.readTree(json)
    val opt = (f: String) => Option(n.get(f)).filter(!_.isNull)
    val t = opt("type").map(_.asText.toUpperCase)
    require(t.isDefined, s"meta query needs a 'type': $json")
    val pf = opt("filter").map(filterFromNode)
      .getOrElse(ParsedFilter(MatchAll, explicitTags = false, 0))
    graft.meta.MetaRequest(
      metaType = t.get,
      filter = pf.filter,
      aggregationField = opt("aggregationField").map(_.asText),
      size = opt("size").map(_.asInt).getOrElse(graft.meta.MetaQueries.SizeLimit))
  }
}
