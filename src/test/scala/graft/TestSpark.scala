package graft

import graft.core.{GraftSession, SeriesId}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One shared local session for all suites (forked test JVM). */
object TestSpark {
  lazy val spark = {
    val s = GraftSession.builder("4").appName("graft-tests").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Fixture builders mirroring the reference's TestUtil.buildEvent
 *  (core/src/test/java/net/opentsdb/aura/metrics/TestUtil.java:30-60). */
object Fixtures {

  /** (metric, tags, ts, value, seq) rows → a points DataFrame, through
   *  the typed ingest-parse shape ([[graft.core.DataPoint]]). */
  def points(rows: (String, Map[String, String], Long, Double, Long)*): DataFrame = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toSeq.map(r => graft.core.DataPoint(r._1, r._2, r._3, r._4, r._5)).toDS().toDF()
      .withColumn("series_id", SeriesId.seriesId(col("metric"), col("tags")))
      .withColumn("segment_start", SeriesId.segmentStart(col("ts")))
  }

  /** Single-series shorthand: (ts, value) pairs, seq = index. */
  def series(metric: String, tags: Map[String, String], pts: (Long, Double)*): DataFrame =
    points(pts.zipWithIndex.map { case ((t, v), i) =>
      (metric, tags, t, v, i.toLong)
    }: _*)
}
