package graft.streaming

import graft.core.Intervals
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** A point row as the stateful operators consume it. */
final case class PointRow(
    series_id: Long, metric: String, tags: Map[String, String],
    ts: Long, value: Double, seq: Long)

/** Per-(series, window) LWW buffer: the winning (seq, value) per
 *  timestamp, carried until the watermark closes the window. */
final case class LwwWindowState(
    metric: String, tags: Map[String, String],
    pending: Map[Long, (Long, Double)])

/** A finalized window in [[graft.rollup.Rollup.build]]'s composite
 *  column vocabulary (None ⇔ the NaN-as-null convention). */
final case class CompositeRow(
    series_id: Long, metric: String, tags: Map[String, String], bucket_ts: Long,
    sum: Option[Double], cnt: Long, min: Option[Double], max: Option[Double],
    last: Option[Double], sumsq: Option[Double])

/** Per-series rate state: the LWW buffer of not-yet-finalized points
 *  plus the last FINALIZED point the next delta chains from. */
final case class RateStreamState(
    metric: String, tags: Map[String, String],
    pending: Map[Long, (Long, Double)],
    lastTs: Long, lastVal: Double, hasLast: Boolean)

/** One finalized rate sample. */
final case class RatePoint(
    series_id: Long, metric: String, tags: Map[String, String],
    ts: Long, value: Double)

/** Per-series streaming-EWMA state: LWW point buffers per OPEN bucket
 *  plus the trailing finalized bucket values the next weighted mean
 *  chains over (bounded at `samples - 1` entries). */
final case class EwmaStreamState(
    metric: String, tags: Map[String, String],
    pending: Map[Long, Map[Long, (Long, Double)]],
    trail: Vector[Double], lastBucket: Long, hasLast: Boolean)

/** One finalized EWMA bucket. */
final case class EwmaPoint(
    series_id: Long, metric: String, tags: Map[String, String],
    bucket_ts: Long, value: Double)

/** Per-series last-write state carried across micro-batches. */
final case class LatestState(last_ts: Long, last_seq: Long, last_value: Double)

/** An event row as [[StreamOps.transitionsStream]] consumes it:
 *  entity key, event type, epoch-second ts, ingest-sequence tiebreak. */
final case class TransRow(k: Long, t: String, ts: Long, seq: Long)

/** Per-entity transition state: the not-yet-finalized (ts, seq, type)
 *  buffer plus the last FINALIZED event the next pair chains from. */
final case class TransStreamState(
    pending: Vector[(Long, Long, String)],
    lastType: String, lastTs: Long, lastSeq: Long, hasLast: Boolean)

/** One emitted transition: `next_type` immediately followed
 *  `prev_type` within entity `k`'s stream, finalized at `ts`. */
final case class TransPair(k: Long, prev_type: String, next_type: String, ts: Long)

/** The updated latest row a batch emits for a series. */
final case class LatestUpdate(
    series_id: Long, metric: String, tags: Map[String, String],
    last_ts: Long, last_value: Double)

/**
 * Spark-native continuous operators over the points stream — the
 * Structured Streaming state/window surfaces, complementing the
 * foreachBatch lake pipeline ([[IngestJob]]):
 *
 *  - [[latestByState]]: the reference's in-memory per-series last-value
 *    tracking (core/.../core/TimeSeriesShard.java:853-959 keeps the live
 *    tail of every series on heap) as `groupByKey(series).
 *    mapGroupsWithState` — state is exactly one (ts, seq, value) triple
 *    per series, Spark's state store handles persistence/recovery, and
 *    each micro-batch emits the updated latest rows. Same
 *    last-write-wins order ((ts, seq) max) as QueryEngine.dedupe and the
 *    latest-log fold, so all three A18 paths agree.
 *  - [[windowedDownsample]]: the ingest-time interval aggregation
 *    (core/.../core/downsample/DownSampler.java:32-56) as an event-time
 *    window aggregate with a watermark: late points inside the watermark
 *    delay still land in their window; a window finalizes (append mode)
 *    once the watermark passes its end — the streaming analog of a
 *    segment flush.
 *
 * Both run on an unbounded stream with state bounded by |series| (plus
 * open windows), which is the property that matters at 100 TB/day: no
 * per-point state, no unbounded buffers.
 */
object StreamOps {

  /** Streaming A18: continuously-maintained per-series latest value. Use
   *  `outputMode("update")`; each batch emits only series that changed. */
  def latestByState(points: DataFrame): Dataset[LatestUpdate] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("series_id"), col("metric"), col("tags"),
        col("ts"), col("value"), col("seq"))
      .as[PointRow]
      .groupByKey(_.series_id)
      .mapGroupsWithState[LatestState, LatestUpdate](GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[PointRow], state: GroupState[LatestState]) =>
          var cur = state.getOption.getOrElse(LatestState(Long.MinValue, Long.MinValue, Double.NaN))
          var repr: PointRow = null
          rows.foreach { p =>
            repr = p
            if (p.ts > cur.last_ts || (p.ts == cur.last_ts && p.seq > cur.last_seq))
              cur = LatestState(p.ts, p.seq, p.value)
          }
          state.update(cur)
          LatestUpdate(repr.series_id, repr.metric, repr.tags, cur.last_ts, cur.last_value)
      }
  }

  /** Streaming downsample: event-time tumbling windows + watermark. Use
   *  `outputMode("append")`; a window row is emitted exactly once, when
   *  the watermark passes its end — and it carries the full A10 composite
   *  (sum/cnt/min/max/last/sumsq, [[graft.rollup.Rollup.build]]'s column
   *  vocabulary, same NaN-as-null convention and (ts, seq)
   *  last-write-wins `last`), so in a pure-streaming deployment this
   *  operator can feed the rollup table directly: the segment flush
   *  becomes `writeStream.partitionBy(segment_start)` over these rows.
   *  Two caveats vs the lake-path flush (which recomputes segments from
   *  the deduped lake): a point for an already-finalized window is
   *  silently dropped by the watermark (the deployment chooses lateness
   *  tolerance via `watermarkDelay`), and a re-sent (series, ts)
   *  duplicate double-counts here — streaming last-write-wins dedupe
   *  isn't expressible with built-in operators
   *  (`dropDuplicatesWithinWatermark` keeps the FIRST arrival, the
   *  reference keeps the last), so exactly-once producers are assumed on
   *  this path — use [[windowedDownsampleLww]] when producers may
   *  re-send. */
  /** LWW-deduping streaming downsample: [[windowedDownsample]] without
   *  the exactly-once-producer assumption. One
   *  `flatMapGroupsWithState` keyed by (series, window) buffers the
   *  WINNING (max-seq) value per timestamp — a re-sent (series, ts)
   *  duplicate with a changed value REPLACES the old one instead of
   *  double-counting (the reference's readAndDedupe last-write-wins,
   *  core/.../RawTimeSeriesEncoder.java:34) — and emits the full A10
   *  composite exactly once, when the watermark passes the window end
   *  (event-time timeout). State is bounded by open windows ×
   *  points-per-window (≤ interval seconds at 1 Hz), evicted at emit.
   *
   *  Emission parity with [[graft.rollup.Rollup.build]] on the deduped
   *  lake is the contract (StreamOpsSpec asserts it bit-equal): same
   *  NaN-as-null convention, same (ts, seq) last-write-wins `last`, and
   *  deterministic ts-ordered summation. Late points beyond the
   *  watermark are dropped, as on the windowedDownsample path. */
  /** Streaming W1: the per-point derivative as a stateful stream. One
   *  `flatMapGroupsWithState` keyed by series buffers an LWW (max-seq
   *  per ts) set of not-yet-finalized points; when the watermark passes
   *  a timestamp, the point finalizes in ts order and emits
   *  `(v − prev_v) / ((ts − prev_ts) / interval)` chained from the last
   *  finalized point — the EXACT scalar restatement of the batch
   *  [[graft.query.QueryEngine.rate]] column math, so finalized output
   *  is bit-identical to the batch rate over the same (deduped) points.
   *
   *  State per series = open points inside the watermark delay + ONE
   *  (ts, value) pair — the same bounded-state contract as
   *  [[latestByState]]. Stragglers at or before the finalized frontier
   *  drop (they would reorder emitted history), exactly the
   *  late-beyond-watermark posture of [[windowedDownsampleLww]]. */
  def rateStream(points: DataFrame, intervalSec: Double = 1.0,
      watermarkDelay: String = "1 hour"): Dataset[RatePoint] =
    chainedDeltaStream(points, watermarkDelay) { (ts, v, lastTs, lastVal) =>
      (v - lastVal) / ((ts - lastTs).toDouble / intervalSec)
    }

  /** Streaming TimeDifference: the same chained per-series state machine
   *  emitting `(ts − prev_ts) / unitSeconds` — the stream twin of
   *  [[graft.query.QueryEngine.timeDifference]], bit-identical on
   *  finalized output (integer-second gaps over one literal divisor). */
  def timeDifferenceStream(points: DataFrame, unitSeconds: Long,
      watermarkDelay: String = "1 hour"): Dataset[RatePoint] =
    chainedDeltaStream(points, watermarkDelay) { (ts, _, lastTs, _) =>
      (ts - lastTs).toDouble / unitSeconds.toDouble
    }

  /** The shared chained-delta state machine behind [[rateStream]] and
   *  [[timeDifferenceStream]]: LWW-buffer points until the watermark
   *  finalizes them in ts order, each emission computed by `delta(ts,
   *  v, lastTs, lastVal)` against the last FINALIZED point. The scalar
   *  is the only thing the two nodes disagree on; everything about
   *  state bounds, straggler posture, and finalization order is one
   *  implementation, so the batch-parity argument transfers. */
  private def chainedDeltaStream(points: DataFrame, watermarkDelay: String)(
      delta: (Long, Double, Long, Double) => Double): Dataset[RatePoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("series_id"), col("metric"), col("tags"),
        col("ts"), col("value"), col("seq"))
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[PointRow]
      .groupByKey(_.series_id)
      .flatMapGroupsWithState[RateStreamState, RatePoint](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (sid, rows, state) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          var st = state.getOption.getOrElse(
            RateStreamState("", Map.empty, Map.empty, 0L, 0.0, hasLast = false))
          rows.foreach { p =>
            // stragglers at/below the finalized frontier would reorder
            // already-emitted deltas: drop, like any late-beyond-watermark
            if (!st.hasLast || p.ts > st.lastTs) {
              val winner = st.pending.get(p.ts).forall(_._1 < p.seq)
              if (winner)
                st = st.copy(metric = p.metric, tags = p.tags,
                  pending = st.pending.updated(p.ts, (p.seq, p.value)))
            }
          }
          val (ready, rest) = st.pending.partition(_._1 <= wmSec)
          val out = Vector.newBuilder[RatePoint]
          ready.toSeq.sortBy(_._1).foreach { case (ts, (_, v)) =>
            if (st.hasLast)
              out += RatePoint(sid, st.metric, st.tags, ts,
                delta(ts, v, st.lastTs, st.lastVal))
            st = st.copy(lastTs = ts, lastVal = v, hasLast = true)
          }
          state.update(st.copy(pending = rest))
          // re-arm: fire once the watermark can finalize the earliest
          // pending point (rest keys are > wmSec by the partition above)
          if (rest.nonEmpty) state.setTimeoutTimestamp(rest.keys.min * 1000)
          out.result().iterator
      }
  }

  /** Streaming EWMA: the moving-average analytic node as a stateful
   *  stream — per series, raw points buffer into LWW daily buckets;
   *  when the watermark passes a bucket's end, the bucket finalizes (in
   *  bucket order), its deduped non-NaN point COUNT becomes the bucket
   *  value, and the operator emits the exponentially-weighted mean of
   *  the trailing `samples` finalized buckets — the EXACT scalar
   *  restatement of the batch lag-chain
   *  ([[graft.operators.SeriesAnalytics.movingAverage]]): weights
   *  `(1-alpha)^k` summed left-to-right k = 0 … samples-1 over the
   *  buckets that EXIST, head windows renormalizing over the present
   *  lags. Counts are exact ints and dyadic weights are exact binary
   *  fractions, so finalized streaming output is bit-identical to the
   *  batch node over the same points (StreamOpsSpec pins it).
   *
   *  State per series = open buckets inside the watermark delay + a
   *  `samples-1`-deep trail of finalized doubles — bounded regardless
   *  of stream length, the [[rateStream]] contract. Stragglers at or
   *  below the finalized frontier drop (they would rewrite emitted
   *  history), the standard late-beyond-watermark posture.
   *
   *  `exponential = false` is the equal-weight (simple) mode of the
   *  same upstream MovingAverageConfig — identical machine, weight 1 at
   *  every lag. */
  def ewmaStream(points: DataFrame, samples: Int, alpha: Double = 0.5,
      bucketSec: Long = 86400L, watermarkDelay: String = "1 hour",
      exponential: Boolean = true): Dataset[EwmaPoint] = {
    require(samples >= 1, s"ewmaStream needs >= 1 samples, got $samples")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col("series_id"), col("metric"), col("tags"),
        col("ts"), col("value"), col("seq"))
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[PointRow]
      .groupByKey(_.series_id)
      .flatMapGroupsWithState[EwmaStreamState, EwmaPoint](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (sid, rows, state) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          var st = state.getOption.getOrElse(
            EwmaStreamState("", Map.empty, Map.empty, Vector.empty, 0L, hasLast = false))
          rows.foreach { p =>
            val bucket = p.ts - java.lang.Math.floorMod(p.ts, bucketSec)
            // stragglers at/below the finalized frontier drop
            if (!st.hasLast || bucket > st.lastBucket) {
              val bmap = st.pending.getOrElse(bucket, Map.empty[Long, (Long, Double)])
              if (bmap.get(p.ts).forall(_._1 < p.seq))
                st = st.copy(metric = p.metric, tags = p.tags,
                  pending = st.pending.updated(bucket, bmap.updated(p.ts, (p.seq, p.value))))
            }
          }
          val (ready, rest) = st.pending.partition { case (b, _) => b + bucketSec <= wmSec }
          val out = Vector.newBuilder[EwmaPoint]
          ready.toSeq.sortBy(_._1).foreach { case (bucket, pts) =>
            // deduped non-NaN count — the batch downsample "count" agg
            val v = pts.valuesIterator.count(!_._2.isNaN).toDouble
            val vals = v +: st.trail
            var num = 0.0
            var den = 0.0
            var k = 0
            while (k < samples && k < vals.length) {
              val w = if (exponential) math.pow(1 - alpha, k) else 1.0
              num += vals(k) * w
              den += w
              k += 1
            }
            out += EwmaPoint(sid, st.metric, st.tags, bucket, num / den)
            st = st.copy(trail = (v +: st.trail).take(samples - 1),
              lastBucket = bucket, hasLast = true)
          }
          state.update(st.copy(pending = rest))
          if (rest.nonEmpty) state.setTimeoutTimestamp((rest.keys.min + bucketSec) * 1000)
          out.result().iterator
      }
  }

  def windowedDownsampleLww(points: DataFrame, interval: String,
      watermarkDelay: String = "1 hour"): Dataset[CompositeRow] = {
    val sec = Intervals.toSeconds(interval)
    val spark = points.sparkSession
    import spark.implicits._

    def finalizeWindow(sid: Long, bucket: Long, st: LwwWindowState): CompositeRow = {
      // ts-ordered fold: deterministic summation order, replayable by a
      // batch engine (Map iteration order is not)
      val vals = st.pending.toSeq.sortBy(_._1)
        .map { case (ts, (seq, v)) => (ts, seq, v) }
      val live = vals.filter(t => !t._3.isNaN) // NaN-as-null convention
      val sum = if (live.isEmpty) None else Some(live.map(_._3).sum)
      CompositeRow(sid, st.metric, st.tags, bucket,
        sum = sum,
        cnt = live.size.toLong,
        min = live.map(_._3).minOption,
        max = live.map(_._3).maxOption,
        last = live.maxByOption(t => (t._1, t._2)).map(_._3),
        sumsq = if (live.isEmpty) None else Some(live.map(t => t._3 * t._3).sum))
    }

    points
      .select(col("series_id"), col("metric"), col("tags"),
        col("ts"), col("value"), col("seq"))
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay) // column must survive to the stateful op
      .as[PointRow]
      .groupByKey(p => (p.series_id, p.ts - java.lang.Math.floorMod(p.ts, sec)))
      .flatMapGroupsWithState[LwwWindowState, CompositeRow](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((sid, bucket), rows, state) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val end = bucket + sec
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(finalizeWindow(sid, bucket, st))
          } else if (end <= wmSec && state.getOption.isEmpty) {
            // straggler past an already-finalized window: drop, like the
            // watermark drops it on the built-in aggregation path
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(LwwWindowState("", Map.empty, Map.empty))
            rows.foreach { p =>
              val winner = st.pending.get(p.ts) match {
                case Some((seq, _)) if seq >= p.seq => false // LWW by seq within a ts
                case _ => true
              }
              if (winner)
                st = LwwWindowState(p.metric, p.tags, st.pending.updated(p.ts, (p.seq, p.value)))
            }
            if (end <= wmSec) { // watermark already past: close immediately
              state.remove()
              Iterator.single(finalizeWindow(sid, bucket, st))
            } else {
              state.update(st)
              state.setTimeoutTimestamp(end * 1000) // fires once wm ≥ end
              Iterator.empty
            }
          }
      }
  }

  def windowedDownsample(points: DataFrame, interval: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val sec = Intervals.toSeconds(interval)
    val v = when(isnan(col("value")), lit(null)).otherwise(col("value"))
    points
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withColumn("__v", v)
      .withColumn("__tj", graft.core.TagsJson.key(col("tags")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("series_id"), col("metric"), col("__tj"),
        window(col("event_time"), s"$sec seconds"))
      .agg(
        sum(col("__v")).as("sum"),
        count(col("__v")).as("cnt"),
        min(col("__v")).as("min"),
        max(col("__v")).as("max"),
        max_by(col("__v"), when(col("__v").isNotNull, struct(col("ts"), col("seq")))).as("last"),
        sum(col("__v") * col("__v")).as("sumsq"))
      .select(col("series_id"), col("metric"),
        graft.core.TagsJson.decode(col("__tj")).as("tags"),
        unix_timestamp(col("window.start")).as("bucket_ts"),
        col("sum"), col("cnt"), col("min"), col("max"), col("last"), col("sumsq"))
  }

  /** Streaming event-type transitions: the stateful twin of
   *  [[graft.operators.Transitions.matrix]]'s pair-chaining stage. One
   *  `flatMapGroupsWithState` keyed by entity buffers not-yet-finalized
   *  (ts, seq, type) events; when the watermark passes a timestamp, its
   *  events finalize in (ts, seq) order and each emits a
   *  (prev_type → next_type) pair chained from the last FINALIZED
   *  event — the exact order the batch lag window walks, so finalized
   *  pairs are identical to the batch chain over the same events
   *  (q_stream_transitions shares the batch oracle through
   *  [[graft.operators.Transitions.fromPairs]]).
   *
   *  Unlike the chained-delta machine this buffer is NOT LWW-keyed by
   *  timestamp: distinct same-second events are distinct steps (the
   *  seq tiebreak orders them), so the buffer is a vector. State per
   *  entity = open events inside the watermark delay + ONE (ts, seq,
   *  type) triple; stragglers at or below the finalized frontier drop
   *  (they would re-chain emitted pairs) — the [[rateStream]] posture. */
  def transitionsStream(events: DataFrame,
      watermarkDelay: String = "1 hour"): Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("k"), col("t"), col("ts"), col("seq"))
      .withColumn("event_time", timestamp_seconds(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .as[TransRow]
      .groupByKey(_.k)
      .flatMapGroupsWithState[TransStreamState, TransPair](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (k, rows, state) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          var st = state.getOption.getOrElse(
            TransStreamState(Vector.empty, "", 0L, 0L, hasLast = false))
          rows.foreach { r =>
            val afterFrontier = !st.hasLast ||
              r.ts > st.lastTs || (r.ts == st.lastTs && r.seq > st.lastSeq)
            if (afterFrontier)
              st = st.copy(pending = st.pending :+ ((r.ts, r.seq, r.t)))
          }
          val (ready, rest) = st.pending.partition(_._1 <= wmSec)
          val out = Vector.newBuilder[TransPair]
          ready.sortBy(e => (e._1, e._2)).foreach { case (ts, seq, t) =>
            if (st.hasLast) out += TransPair(k, st.lastType, t, ts)
            st = st.copy(lastType = t, lastTs = ts, lastSeq = seq, hasLast = true)
          }
          state.update(st.copy(pending = rest))
          if (rest.nonEmpty) state.setTimeoutTimestamp(rest.iterator.map(_._1).min * 1000)
          out.result().iterator
      }
  }
}
