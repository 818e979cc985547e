package graft.streaming

import org.apache.spark.sql.{Column, SparkSession}

/**
 * The scheduled maintenance pass a deployment runs beside (or between)
 * ingest triggers — ONE call composing every already-specced primitive
 * in an order where no later pass resurrects what an earlier one
 * removed, returning a report of what ran. Reference analog: the
 * flusher's segment consolidation plus the shard's purge job
 * (core/.../core/TSFlusherImp.java:168-430;
 * core/.../core/TimeSeriesShard.java:446-645).
 *
 *  1. retention purge of expired segment partitions — file-level drop,
 *     no rewrite — plus re-flush of any rung window straddling the
 *     cutoff from the surviving segments ([[IngestJob.purgeAndRepair]]);
 *  2. series/latest log maintenance — idle-series removal when a
 *     cutoff is given ([[IngestJob.purgeIdleSeries]], which also
 *     snapshots the logs), else a plain one-row-per-series compaction
 *     ([[IngestJob.compact]]);
 *  3. points-file consolidation of surviving oversized segments
 *     ([[IngestJob.compactPoints]]);
 *  4. maintained-sketch folds — the count-min cell store and every
 *     configured DDSketch grain ([[StoreCompaction]]), with optional
 *     per-store retention applied DURING the fold (`sketchRetain`,
 *     e.g. a day-keyed cutoff predicate for a daily grain — the key
 *     encoding is the caller's contract, so the predicate is too).
 *
 * Every sub-pass is independently race-safe against a live ingest (the
 * planned-files swap discipline — see each primitive's scaladoc), so
 * the composition is as well; the one global caveat is StoreCompaction's
 * documented reader window (a reader overlapping a fold's swap can see
 * a folded batch twice), which is why deployments run this pass where
 * their readers tolerate it or between query windows.
 */
object Maintenance {

  /** What a pass did: segments dropped by retention, segments whose
   *  point files were consolidated, and the sketch stores folded
   *  (store name — "cms" or the DdsConfig name). */
  final case class Report(
      purgedSegments: Seq[Long],
      compactedSegments: Seq[Long],
      sketchStoresFolded: Seq[String])

  def run(spark: SparkSession, cfg: IngestJob.Config,
      retentionCutoffSec: Option[Long] = None,
      idleCutoffSec: Option[Long] = None,
      targetFileBytes: Long = 128L << 20,
      sketchRetain: Map[String, Column] = Map.empty): Report = {
    val purged = retentionCutoffSec.map(IngestJob.purgeAndRepair(spark, cfg, _)).getOrElse(Nil)
    idleCutoffSec match {
      case Some(cut) => IngestJob.purgeIdleSeries(spark, cfg, cut)
      case None => IngestJob.compact(spark, cfg)
    }
    val compacted = IngestJob.compactPoints(spark, cfg, targetFileBytes)
    def foldStore(name: String, dir: String,
        merge: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Option[String] = {
      val folded = sketchRetain.get(name) match {
        case Some(retain) => StoreCompaction.compactRetained(spark, dir, retain, merge)
        case None => StoreCompaction.compactBatchStore(spark, dir, merge)
      }
      if (folded) Some(name) else None
    }
    val folds =
      cfg.cms.toSeq.flatMap(_ => foldStore("cms", IngestJob.cmsPath(cfg),
        graft.operators.CountMin.merge)) ++
      cfg.dds.flatMap(c => foldStore(c.name, IngestJob.ddsPath(cfg, c.name),
        graft.operators.QuantileSketch.merge))
    Report(purged, compacted, folds)
  }
}
