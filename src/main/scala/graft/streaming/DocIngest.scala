package graft.streaming

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * End-to-end streaming DOCUMENT ingest — the corpus-side sibling of the
 * metrics [[IngestJob]]: a file-source stream of document batches flows
 * through content-hash dedup-on-arrival ([[Dedup.exactStreaming]],
 * first-arrival-wins) into an append-only parquet lake, so every
 * downstream corpus stage reads an already-exact-deduped store.
 *
 * The dedup state (one entry per distinct content hash) lives in the
 * Spark state store under `ckptDir`: a restarted job keeps rejecting
 * copies of content admitted in earlier runs — which is what makes
 * dedup-on-ingest trustworthy across a fleet of incremental crawls. At
 * 100 TB/day bound the state with the watermarked variant
 * (`Dedup.exactStreaming(docs, eventTimeCol = Some(...))`) — copies
 * arriving within the delay still collapse, older state is evicted.
 */
object DocIngest {

  /** Start the ingest over `srcDir` (parquet files of `schema`), writing
   *  admitted documents to `outDir`. `Trigger.AvailableNow` drains
   *  what's present and stops — call again as new batches land. */
  def run(spark: SparkSession, srcDir: String, outDir: String, ckptDir: String,
      schema: StructType): StreamingQuery =
    Dedup.exactStreaming(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .option("checkpointLocation", ckptDir)
      .format("parquet").option("path", outDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** The FULL document-pipeline ingest: PII scrub → quality gate →
   *  dedup-on-REDACTED-content, all at arrival time. Ordering is the
   *  point: scrubbing BEFORE hashing makes two crawls of the same page
   *  differing only in injected PII (session ids, tracking emails)
   *  collapse to one admitted document — dedup keyed on raw content
   *  would admit both. Scrub and gate are stateless per-row columns
   *  ([[TextAnalysis.redactedText]]/[[TextAnalysis.keepExpr]] — the
   *  latter is the batch quality gate's bit-identical per-row
   *  restatement), so the only streaming state remains the dedup hash
   *  set in the checkpoint, exactly as [[run]].
   *
   *  Within one micro-batch `dropDuplicates` keeps an arbitrary member
   *  of each content group, so downstream contracts must key on
   *  content-determined columns (the declared `q_stream_doc_pipeline`
   *  exposes only those); across batches/restarts first-arrival-wins
   *  deterministically via the state store. */
  def runPipeline(spark: SparkSession, srcDir: String, outDir: String,
      ckptDir: String, schema: StructType): StreamingQuery = {
    val scrubbed = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("text", TextAnalysis.redactedText(col("text")))
      .filter(TextAnalysis.keepExpr(col("text")))
    Dedup.exactStreaming(scrubbed)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .format("parquet").option("path", outDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
