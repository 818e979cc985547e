package graft.sinks

import org.apache.spark.sql.DataFrame

/**
 * The sink-strategy surface (P4) — the counterpart of the reference's
 * Flusher / Uploader / MetaWriter factories (core/.../core/Flusher.java,
 * metaflush/UploaderFactory.java): where a batch of points lands is a
 * pluggable strategy, so the ingest job can target the partitioned lake,
 * a throwaway benchmark sink, or a future table format without changing
 * the streaming logic.
 */
trait PointsSink {
  def name: String
  def append(batch: DataFrame): Unit
}

/** The production sink: segment-partitioned parquet append. */
final class PartitionedParquetSink(dir: String) extends PointsSink {
  def name = s"parquet:$dir"
  def append(batch: DataFrame): Unit =
    batch.write.mode("append").partitionBy("segment_start").parquet(dir)
}

/** Materialize-and-discard (benchmarks / dry runs). */
final class NoopSink extends PointsSink {
  def name = "noop"
  def append(batch: DataFrame): Unit =
    batch.write.format("noop").mode("overwrite").save()
}

object Sinks {
  type Factory = String => PointsSink
  private val factories = scala.collection.concurrent.TrieMap[String, Factory](
    "parquet" -> (dir => new PartitionedParquetSink(dir)),
    "noop" -> (_ => new NoopSink))

  def register(scheme: String, f: Factory): Unit = factories.put(scheme, f): Unit

  def resolve(uri: String): PointsSink = uri.split(":", 2) match {
    case Array(scheme, rest) if factories.contains(scheme) => factories(scheme)(rest)
    case Array(scheme) if factories.contains(scheme) => factories(scheme)("")
    case _ => throw new IllegalArgumentException(s"no sink factory for: $uri")
  }
}
