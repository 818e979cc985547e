package graft.core

import org.apache.spark.sql.SparkSession

/** Standard session config for the engine.
 *
 * - shuffle partitions sized to the local core count (the driver's
 *   contract pins 32 on the bench host); on a real cluster this is
 *   superseded by AQE coalescing, which we leave on.
 * - `nanosAsLong` lets us read TIMESTAMP(NANOS) parquet (the driver's
 *   `events` table in some generations) as raw Long nanos, which we
 *   floor-divide to the engine's epoch-second domain — exact integer
 *   math, no tz traps.
 * - `inferTimestampNTZ` off: generator output has flipped between
 *   UTC-flagged and naive `timestamp[us]` across rounds; naive micros
 *   must keep reading as TIMESTAMP_LTZ (stored value = UTC micros,
 *   identical bytes interpretation, `cast(.. as long)` = epoch seconds)
 *   instead of TIMESTAMP_NTZ, which refuses the numeric cast.
 */
object GraftSession {
  def builder(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // segment-pruning rule + native functions (graft.plans.SegmentPruning)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
}
