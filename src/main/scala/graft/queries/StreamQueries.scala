package graft.queries

import graft.query.{DownsampleSpec, QueryEngine}
import graft.streaming.IngestJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming-ingest correctness queries: the driver's events table is
 * streamed through [[IngestJob]] (file source → foreachBatch appends into
 * a partitionBy(segment_start) lake + series/latest logs), then queried
 * from the streamed lake and checked against the same DuckDB oracles as
 * the batch path — proving ingest loses/duplicates nothing.
 */
object StreamQueries {
  import OracleCommon._

  type Q = (SparkSession, String) => DataFrame

  /** One streamed lake per source dir per JVM (Verify runs all queries in
   *  one session; the ingest runs once and both queries read it). */
  private val lakes = scala.collection.concurrent.TrieMap.empty[String, IngestJob.Config]

  private def lakeFor(s: SparkSession, d: String): IngestJob.Config =
    lakes.getOrElseUpdate(d, {
      val base = java.nio.file.Files.createTempDirectory("graft_stream")
      // the file stream source wants a directory: expose the single
      // events parquet through a symlinked source dir
      val srcDir = base.resolve("src")
      java.nio.file.Files.createDirectory(srcDir)
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      // retention wide open here: the synthetic table spans 30 days in one
      // batch; admission-drop behavior is unit-tested separately
      val cfg = IngestJob.Config(s"$base/lake", s"$base/ckpt", retentionSec = Long.MaxValue / 4)
      IngestJob.run(s, srcDir.toString, cfg).awaitTermination()
      cfg
    })

  val defs: Map[String, Q] = Map(
    // A18 served from the streaming-maintained latest log (no fact scan)
    "q_stream_latest" -> { (s, d) =>
      IngestJob.latest(s, lakeFor(s, d))
        .select(col("metric"), col("tags")("user").as("tag_user"),
          col("tags")("host").as("tag_host"), col("tags")("colo").as("tag_colo"),
          col("last_ts"), round(col("last_value"), 4).as("last_value"))
    },

    // S4/F10 over the streamed partitioned lake: the segment_start
    // conjunct prunes partitions (bounds are segment-aligned)
    "q_stream_ds_sum" -> { (s, d) =>
      val pts = IngestJob.points(s, lakeFor(s, d))
        .filter(col("segment_start") >= lit(Start) && col("segment_start") < lit(End))
        .filter(col("ts") >= lit(Start) && col("ts") < lit(End))
      QueryEngine.downsample(QueryEngine.dedupe(pts), DownsampleSpec("1d", "sum"), Start, End)
        .select(col("metric"), col("tags")("user").as("tag_user"), col("bucket_ts"),
          round(col("value"), 4).as("sum_value"))
    },

    // series_dim maintained by the stream matches the batch-derived one
    "q_stream_series_dim" -> { (s, d) =>
      IngestJob.seriesDim(s, lakeFor(s, d))
        .select(col("metric"), col("tags")("user").as("tag_user"), col("tag_count"),
          col("first_seen"), col("last_seen"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_stream_latest" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user, tag_host, tag_colo,
         |       ts AS last_ts, ${rnd("value")} AS last_value
         |FROM points
         |QUALIFY row_number() OVER (PARTITION BY metric, tag_user
         |                           ORDER BY ts DESC, seq DESC) = 1""".stripMargin,

    "q_stream_ds_sum" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user, ts - ts % 86400 AS bucket_ts, ${rnd("sum(value)")} AS sum_value
         |FROM dedup WHERE ${inRange()}
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_stream_series_dim" ->
      s"""WITH $pointsCtes
         |SELECT metric, tag_user,
         |       CASE WHEN tag_env IS NULL THEN 3 ELSE 4 END AS tag_count,
         |       min(ts) AS first_seen, max(ts) AS last_seen
         |FROM points
         |GROUP BY 1, 2, 3""".stripMargin
  )
}
