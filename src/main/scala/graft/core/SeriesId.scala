package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Stable series identity.
 *
 * The reference identifies a series by XXH64(metric) combined with
 * XXH64(canonical tag bytes) (reference core/XxHash.java:25-41,
 * TimeSeriesShard.java:857-858); tags are serialized as NUL-separated
 * key/value byte runs sorted by key (reference core/Util.java:45-100).
 *
 * We reproduce the *identity semantics* (same metric + same tag set =>
 * same 64-bit id, stable across ingest and query) with Spark's native
 * `xxhash64` — same XXH64 family — over a canonical string form. The
 * canonical form sorts entries by key and joins with NUL separators so
 * it is injective for tag values that contain no NUL (the reference has
 * the same restriction).
 */
object SeriesId {

  /** Canonical NUL-separated `k0\u0000v0\u0000k1\u0000v1…` sorted by key. */
  def canonicalTags(tags: Column): Column =
    concat_ws(
      "\u0000",
      flatten(transform(array_sort(map_entries(tags)), e => array(e("key"), e("value")))))

  /** 64-bit series id from metric + canonical tags (XXH64, seed 42). */
  def seriesId(metric: Column, tags: Column): Column =
    xxhash64(metric, canonicalTags(tags))

  /** Metric-only hash (reference metricHash). */
  def metricId(metric: Column): Column = xxhash64(metric)

  /** Tag-set-only hash (reference tagsSetHash — also the shard routing key,
   *  reference core/BaseStorage.java:126-131). */
  def tagSetId(tags: Column): Column = xxhash64(canonicalTags(tags))

  /** Segment window floor: `t - (t % secondsInASegment)`
   *  (reference core/TimeseriesStorageContext.java:75-77). */
  def segmentStart(ts: Column, segmentSeconds: Long = TsdbSchema.SegmentSeconds): Column =
    ts - (ts % lit(segmentSeconds))
}
