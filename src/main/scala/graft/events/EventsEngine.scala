package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** An events query — text + namespace + time range + dimension equals,
 *  mirroring the clauses the reference assembles per daily index
 *  (events-lucene/.../lucene/LuceneQueryBuilder.java:84-130). */
final case class EventsQuery(
    start: Long,
    end: Long,
    text: Option[String] = None,
    namespace: Option[String] = None,
    dims: Map[String, String] = Map.empty)

/** A full events REQUEST: the selection plus the execution shape the
 *  reference's runner reads off the query config — group-by dimension
 *  (+fetchLast), per-minute downsample, or sorted from/size paging
 *  (events-lucene/.../query/QueryRunner.java:99-143,169-268). Parsed
 *  from client JSON by [[graft.query.TsdbJson.parseEventsRequest]],
 *  executed by [[EventsEngine.run]]. */
final case class EventsRequest(
    query: EventsQuery,
    groupBy: Option[String] = None,
    fetchLast: Boolean = false,
    downsample: Boolean = false,
    from: Int = 0,
    size: Option[Int] = None)

/**
 * Events query operators (reference events-lucene QueryRunner):
 * search scan, sort + from/size paging, group-by with hit counts +
 * fetch-last, per-minute downsample, top-1 per group.
 *
 * Scale notes: all operators are single declarative plans. Search is a
 * scan with pushed predicates (the `day` conjunct prunes daily
 * partitions — the analog of the reference picking which daily Lucene
 * indices to open, QueryRunner.java:99-131). Group-by is a hash
 * aggregate; fetch-last rides the same aggregate via max_by, so there is
 * exactly one shuffle keyed by the group dimension.
 */
object EventsEngine {

  /** Lucene-ish term → contains-regex, the reference's
   *  `convertToRegex` (events-lucene/.../query/QueryParser.java:60-66):
   *  `*` → `.*`, then wrap `.*term.*` (find semantics make the wrap
   *  redundant under rlike, kept for fidelity). */
  def termToRegex(term: String): String = term.replace("*", ".*")

  /** Multi-term, multi-field text predicate: each whitespace-split term
   *  must match (case-insensitively) in at least one searchable field
   *  (reference QueryParser.java:29-66 parse + LuceneQueryBuilder
   *  multi-field clause). */
  def textPredicate(query: String, fields: Seq[String] = EventsModel.SearchFields): Column =
    query.trim.split("""\s+""").toSeq.map { term =>
      val re = termToRegex(term.toLowerCase)
      fields.map(f => lower(col(f)).rlike(re)).reduce(_ || _)
    }.reduce(_ && _)

  /** Time-range + namespace + dims clause: an event matches the range if
   *  its start OR end falls inside, OR it is ongoing
   *  (reference LuceneQueryBuilder.java:119-130). */
  def matchPredicate(q: EventsQuery): Column = {
    val inRange = (c: Column) => c >= lit(q.start) && c < lit(q.end)
    val time = inRange(col("start_ts")) || inRange(col("end_ts")) || col("ongoing")
    val ns = q.namespace.map(col("namespace") === _).getOrElse(lit(true))
    val text = q.text.map(textPredicate(_)).getOrElse(lit(true))
    val dims = q.dims.map { case (k, v) => col("dimensions")(k) === v }
      .reduceOption(_ && _).getOrElse(lit(true))
    time && ns && text && dims
  }

  /** Upper bound on end_ts − start_ts in the document model (6×600 s).
   *  A real deployment tracks the max open span as index metadata. */
  val MaxEventSpanSec: Long = 3600L

  /** Daily-index selection (reference QueryRunner.java:99-131): only day
   *  partitions that could hold a match are consulted. The lower bound
   *  is widened by [[MaxEventSpanSec]] so an event whose *end* falls in
   *  range keeps its (earlier) start-day partition. Semantics decision,
   *  reference-faithful: an ongoing event whose start day lies outside
   *  the widened window does NOT match — exactly as the reference never
   *  opens that day's index. Both bounds are foldable literals, so on a
   *  day-partitioned store this becomes a partition filter and whole day
   *  directories are skipped; fixtures without a `day` column skip the
   *  conjunct (and the pruning). */
  def dayConjunct(docs: DataFrame, q: EventsQuery): Column =
    if (!docs.columns.contains("day")) lit(true)
    else col("day") >= date_format(to_timestamp(lit(q.start - MaxEventSpanSec)), "yyyy-MM-dd") &&
      col("day") <= date_format(to_timestamp(lit(q.end - 1)), "yyyy-MM-dd")

  /** Search scan (S10): day-partition pruning conjunct + full predicate. */
  def search(docs: DataFrame, q: EventsQuery): DataFrame =
    docs.filter(dayConjunct(docs, q) && matchPredicate(q))

  /** Sort + paging (T1): newest first by start time, from/size offsets
   *  (reference QueryRunner.java:99-143). Ties break by event_id for
   *  deterministic paging (the reference's tie order is Lucene doc order,
   *  which is not defined across indices). */
  def page(docs: DataFrame, q: EventsQuery, from: Int, size: Int): DataFrame =
    search(docs, q)
      .orderBy(col("start_ts").desc, col("event_id").desc)
      .offset(from)
      .limit(size)

  /** Group-by a dimension (A16): per group hit count and optionally the
   *  latest event (reference QueryRunner.java:174-268 searchAndGroup;
   *  latest-merge IndexGroupResponse.java:58-64). fetchLast rides the
   *  same hash aggregate via max_by — no second pass. */
  def group(docs: DataFrame, q: EventsQuery, dim: String, fetchLast: Boolean): DataFrame = {
    val base = search(docs, q).withColumn("__dim", col("dimensions")(dim))
    if (!fetchLast) {
      base.groupBy(col("__dim").as(dim)).agg(count(lit(1)).as("hits"))
    } else {
      base.groupBy(col("__dim").as(dim))
        .agg(
          count(lit(1)).as("hits"),
          max_by(
            struct(col("event_id"), col("title"), col("start_ts")),
            struct(col("start_ts"), col("event_id"))).as("__last"))
        .select(col(dim), col("hits"),
          col("__last.event_id").as("last_event_id"),
          col("__last.title").as("last_title"),
          col("__last.start_ts").as("last_start_ts"))
    }
  }

  /** Structured-attribute analytics over the event payload: the
   *  reference's events are Lucene documents whose additional fields are
   *  indexed and queryable (events-lucene EventDocument / Fields); here
   *  the payload rides `message` as a JSON object and ONE codegen'd
   *  `get_json_object` projection extracts the numeric field inline with
   *  the search filter — no second pass, no UDF — before a plain hash
   *  aggregate per (namespace, day). `with_field` counts events actually
   *  carrying the field (absent/non-numeric extract to NULL and drop out
   *  of sum/max), so sparse payloads aggregate honestly. Integer sums
   *  stay exact at any scale. */
  def attributeStats(docs: DataFrame, q: EventsQuery, field: String): DataFrame = {
    // the field name splices into the JSON-path string: a metacharacter
    // (dot/bracket/quote) would silently extract nothing and report
    // with_field=0 — reject it loudly instead
    require(field.matches("^[A-Za-z0-9_]+$"),
      s"attribute field must be a simple identifier ([A-Za-z0-9_]+): '$field'")
    search(docs, q)
      .withColumn("__a", get_json_object(col("message"), "$." + field).cast("long"))
      .groupBy(col("namespace"), (col("start_ts") - col("start_ts") % 86400).as("day"))
      .agg(count(lit(1)).as("hits"),
        count(col("__a")).as("with_field"),
        sum(col("__a")).as("field_sum"),
        max(col("__a")).as("field_max"))
  }

  /** Events downsample (A17): per-minute hit counts — the reference
   *  groups on the index-time `timestampMinute` field
   *  (QueryRunner.java:169-172, Fields.java:31). */
  def downsample(docs: DataFrame, q: EventsQuery): DataFrame =
    search(docs, q)
      .groupBy((col("start_ts") - col("start_ts") % 60).as("bucket_ts"))
      .agg(count(lit(1)).as("hits"))

  /** Execute a full [[EventsRequest]] — the dispatch the reference's
   *  runner performs on its query config (grouped vs paged vs
   *  downsampled search): `groupBy` wins (with optional fetchLast),
   *  then `downsample`, then `size`-bounded paging, else the plain
   *  search scan. One request maps to exactly one of the operators
   *  above, so every JSON-arriving query replays the same plan as its
   *  direct-ADT twin. */
  def run(docs: DataFrame, r: EventsRequest): DataFrame =
    r.groupBy match {
      case Some(dim) => group(docs, r.query, dim, r.fetchLast)
      case None if r.downsample => downsample(docs, r.query)
      case None if r.size.isDefined => page(docs, r.query, r.from, r.size.get)
      case None => search(docs, r.query)
    }

  /** Top-1 per group (W6): latest event per group value — the reference
   *  sorts within group by start desc and keeps maxDocsPerGroup = 1
   *  (QueryRunner.java:215-218,137-141). */
  def topOnePerGroup(docs: DataFrame, q: EventsQuery, dim: String): DataFrame = {
    val w = Window.partitionBy(col("dimensions")(dim))
      .orderBy(col("start_ts").desc, col("event_id").desc)
    search(docs, q)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
