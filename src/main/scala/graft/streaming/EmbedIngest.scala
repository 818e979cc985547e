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
 * oracle restates. Late or replayed vectors append idempotently at the
 * file level (the checkpoint dedupes source files, the assignment is a
 * pure function of the vector).
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfAssignWith(batch, cents)
          .select(col("vec_id"), col("cell"), col("d"))
          .write.mode("append").partitionBy("cell").parquet(outDir)
      }
      .start().awaitTermination()
}
