package graft.streaming

import graft.pipeline.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/**
 * Streaming face of the IVF embedding index: vectors arriving on the
 * crawl are assigned to their nearest constant-k centroid as they land,
 * and appended to a cell-partitioned parquet index that ANN queries
 * prune by cell.
 *
 * The assignment is row-local math against a FIXED centroid table (the
 * [[Similarity.hashSampledCentroids]] / Lloyd-refined constant-k
 * contract — the table never depends on what streamed in), so each
 * micro-batch runs the exact batch argmin inside `foreachBatch`: no
 * state store, no watermark, and the streamed index is bit-identical to
 * a batch re-assignment of the same vectors — which is exactly what the
 * oracle restates. Whole-run replays dedupe at the source (the
 * checkpoint tracks drained files), and WITHIN a run each micro-batch
 * writes to a `batch_id=N` partition directory with overwrite — a batch
 * retried after a crash between the parquet write and the checkpoint
 * commit replaces its own directory instead of appending a duplicate,
 * so the sink is exactly-once, not merely at-least-once.
 *
 * At 100 TB: the centroid table is small by contract (it broadcasts
 * inside the per-batch argmin), each micro-batch shuffles only itself,
 * and `partitionBy(cell)` keeps the index directly prunable — a query
 * probing one cell reads one partition, never the corpus.
 */
object EmbedIngest {

  val EmbSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Drain `srcDir`'s parquet vectors through nearest-centroid
   *  assignment against `cents` into a cell-partitioned index at
   *  `outDir`. `Trigger.AvailableNow` processes what's present and
   *  stops — call again as new crawl batches land. */
  def run(spark: SparkSession, srcDir: String, cents: DataFrame,
      outDir: String, ckptDir: String): Unit =
    spark.readStream.schema(EmbSchema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-keyed subdirectory + overwrite = idempotent on retry
        // (readers see batch_id as one more partition column; cell
        // pruning is unaffected by the extra level)
        Similarity.ivfAssignWith(batch, cents)
          .select(col("vec_id"), col("cell"), col("d"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$outDir/batch_id=$batchId")
      }
      .start().awaitTermination()

  /** Streamed ANN QUERY SERVING — the read side of the streamed index:
   *  retrieval requests arrive as (q_id, embedding) parquet batches and
   *  each micro-batch is answered by [[Similarity.ivfTopKQueries]]
   *  against the prebuilt assigned index — the query batch probes its
   *  cells via the broadcast centroid table and scans only those
   *  inverted lists (with a cell-partitioned stored index, only those
   *  partitions). Answers are a pure per-query function of (query,
   *  index), so results are independent of how requests batch — the
   *  streamed result set equals the batch restatement, which the
   *  declared query pins against the batch IVF oracle. Sink:
   *  batch-keyed overwrite, the exactly-once pattern above. */
  def runQueryServe(spark: SparkSession, srcDir: String, assigned: DataFrame,
      cents: DataFrame, outDir: String, ckptDir: String, k: Int,
      nprobe: Int = 1, maxFilesPerTrigger: Option[Int] = None): Unit = {
    val schema = StructType(Seq(
      StructField("q_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val reader0 = spark.readStream.schema(schema)
    val reader = maxFilesPerTrigger
      .fold(reader0)(n => reader0.option("maxFilesPerTrigger", n))
    reader.parquet(srcDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.ivfTopKQueries(assigned, cents, batch, k, nprobe)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start().awaitTermination()
  }
}
