package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Input-mode dispatch for the ingest job — the registry analog of the
 * reference's `InputMode {KAFKA, PULSAR, DATA_GEN}` switch
 * (opentsdb/.../AuraMetricsService.java:150-155), uniform with the P3/P4
 * source/sink factories: a scheme-keyed URI picks the stream source, and
 * every mode funnels through the one [[IngestJob.processBatch]] pipeline.
 *
 *   file:<dir>                — parquet file stream ([[IngestJob.run]])
 *   datagen:<rowsPerSecond>   — synthetic rate source ([[IngestJob.runDataGen]])
 *   kafka:<brokers>/<topic>   — broker stream ([[KafkaSource.run]])
 *
 * A Pulsar mode registers the same way (its Spark connector exposes a
 * key/value wire schema [[KafkaSource.parse]] can serve with a column
 * rename); no broker of either kind exists in this environment.
 */
object IngestInputs {

  type Starter = (SparkSession, String, IngestJob.Config) => StreamingQuery

  private val modes = scala.collection.concurrent.TrieMap[String, Starter](
    "file" -> ((s, dir, cfg) => IngestJob.run(s, dir, cfg)),
    "datagen" -> ((s, rate, cfg) =>
      IngestJob.runDataGen(s, cfg, rowsPerSecond = rate.toIntOption.getOrElse(1000))),
    "kafka" -> ((s, rest, cfg) => rest.split("/", 2) match {
      case Array(brokers, topic) => KafkaSource.run(s, brokers, topic, cfg)
      case _ => throw new IllegalArgumentException(s"kafka:<brokers>/<topic> expected: $rest")
    }))

  def register(scheme: String, starter: Starter): Unit = modes.put(scheme, starter): Unit

  def start(spark: SparkSession, uri: String, cfg: IngestJob.Config): StreamingQuery =
    uri.split(":", 2) match {
      case Array(scheme, rest) if modes.contains(scheme) => modes(scheme)(spark, rest, cfg)
      case _ => throw new IllegalArgumentException(s"no ingest input mode for: $uri")
    }
}
