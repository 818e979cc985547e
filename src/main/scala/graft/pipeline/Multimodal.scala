package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: media payloads are opaque `binary` columns
 * with typed metadata; decode / feature-extract / frame-sample are
 * operators over them.
 *
 * The real media codecs are NOT in this environment, so the decode step
 * is a deterministic stub ([[DecodeStub]]) — but everything Spark-side is
 * real and tested: the binary schema, the per-partition batched decode
 * (the Scala analog of `mapInPandas` — one iterator pass, batch-sized
 * state, no per-row setup), frame offsets, and metadata projection.
 *
 * The driver ships no media table, so payloads are derived
 * deterministically from `documents.text` (UTF-8 bytes) — the oracle can
 * rebuild the same bytes.
 */
object Multimodal {

  /** documents → media view: payload bytes + modality + typed metadata. */
  def media(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 32).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))
  }

  val FrameBytes = 256

  /** Metadata + payload-size projection (pure column ops). */
  def metaView(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("modality"),
      length(col("payload")).as("byte_len"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      ceil(length(col("payload")).cast("double") / FrameBytes).cast("long").as("n_frames"))

  /** Frame sampling: one row per FrameBytes-sized chunk with a content
   *  fingerprint — `explode` over computed offsets; the chunk is sliced
   *  from the payload's hex form (2 chars/byte) so the fingerprint is
   *  portable across engines. All codegen'd built-ins. */
  def frames(media: DataFrame): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / FrameBytes).cast("int")
    val hexChunk = lower(hex(col("payload")))
      .substr(col("frame_id") * (FrameBytes * 2) + 1, lit(FrameBytes * 2))
    media
      // empty payload ⇒ zero frames, not a [0, -1] descending sequence
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"), explode(sequence(lit(0), nFrames - 1)).as("frame_id"))
      .select(
        col("doc_id"), col("frame_id"),
        (length(hexChunk) / 2).cast("long").as("frame_bytes"),
        substring(md5(hexChunk), 1, 12).as("frame_fp"))
  }

  /** Resize stub: recompute target metadata exactly and "resample" the
   *  payload deterministically (proportional hex prefix — a real codec
   *  would decode + scale here). Spark-side shape is the real thing: a
   *  per-row projection over binary + struct columns. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val srcArea = col("meta.width") * col("meta.height")
    val frac = lit(targetW * targetH).cast("double") / srcArea.cast("double")
    val keepBytes = greatest(
      least(ceil(length(col("payload")).cast("double") * frac).cast("int"),
        length(col("payload"))),
      lit(1))
    media
      .filter(col("modality") === "image")
      .select(
        col("doc_id"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        keepBytes.cast("long").as("resized_bytes"),
        substring(md5(lower(hex(col("payload"))).substr(lit(1), keepBytes * 2)), 1, 12)
          .as("resized_fp"))
  }

  /**
   * Batched "decode + feature-extract" over payload bytes — the
   * `mapInPandas` analog: a single-pass partition iterator with
   * per-partition (not per-row) codec state, expressed as a typed
   * Dataset `mapPartitions` so rows stay on Tungsten encoders (no Row
   * RDD detour). The feature extraction is a STUB — a real
   * implementation would hand `payload` to an image/audio decoder here
   * (or use `mapInArrow` for a columnar-batch handoff); this one derives
   * 4 deterministic pseudo-features from the payload digest so the
   * pipeline shape is testable end-to-end (each feature = a 28-bit md5
   * slice / 2^28 ∈ [0,1)).
   */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec state (the expensive setup a real decoder has)
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, payload) =>
          val hexPayload = payload.map("%02x".format(_)).mkString
          digest.reset()
          val d = digest.digest(hexPayload.getBytes("UTF-8"))
          val hexDigest = d.map("%02x".format(_)).mkString
          def f(j: Int): Double =
            java.lang.Long.parseLong(hexDigest.substring(j * 7, j * 7 + 7), 16) / math.pow(2, 28)
          (docId, f(0), f(1), f(2), f(3))
        }
      }
      .toDF("doc_id", "f0", "f1", "f2", "f3")
  }
}
