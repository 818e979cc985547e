package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Compaction for the batch-partitioned COUNT stores the ingest maintains
 * (count-min cells, DDSketch buckets, drift/PMI token counts): each
 * micro-batch appends one `batch_id=N` partition of partial counts, and
 * every read merges the whole log by summing. At a 1-minute trigger
 * cadence that is ~1,440 partitions/day — the read stays CORRECT forever
 * (counts are sums, merge order is irrelevant) but pays file listing +
 * small-file open cost linear in batch COUNT. This job folds the closed
 * partitions into one snapshot partition, the counts-are-sums analog of
 * the points-file consolidation ([[IngestJob.compactPoints]]; reference
 * flush consolidation: core/.../core/TSFlusherImp.java:168-430).
 *
 * Replay safety: Structured Streaming's foreachBatch can re-run only the
 * LAST batch after a crash (committed batches never replay), and the
 * ingest writes each partial via dynamic overwrite of its own batch_id
 * partition. The fold therefore always EXCLUDES the max batch_id
 * partition: a replay of that batch rewrites its partition whether or
 * not a compaction ran in between, and the folded snapshot only ever
 * contains batches that can no longer change.
 *
 * Concurrency: run this as an offline maintenance pass (between
 * triggers, or on the closed prefix of a live store). The swap is
 * per-file (staged snapshot files move in, exactly the planned source
 * files are deleted) so a micro-batch APPENDING a new partition
 * concurrently is never touched — but a READER overlapping the brief
 * move-in/delete window could see a folded batch twice, and unlike the
 * LWW logs a counts-are-sums read does not collapse duplicates. The
 * ingest harnesses run it post-ingest, the posture of
 * [[IngestJob.compact]].
 */
object StoreCompaction {

  /** The snapshot partition's batch_id. Real batch ids are non-negative,
   *  so the snapshot can never collide with (or be mistaken for) a
   *  replayable batch; repeated compactions fold the previous snapshot
   *  into the next. */
  val SnapshotBatchId: Long = -1L

  /** Fold every closed `batch_id=N` partition of `dir` (all but the max
   *  batch id — see the replay-safety note above) plus any previous
   *  snapshot into one `batch_id=-1` snapshot partition, using `fold`
   *  (the store's merge: cell-wise / key-wise count sum). Returns true
   *  if a fold happened; with fewer than `minFolded` closed partitions
   *  the store is left untouched (a pure fold of one partition gains
   *  nothing — but a RETAINING fold does, so [[compactRetained]] passes
   *  minFolded = 1). */
  def compactBatchStore(spark: SparkSession, dir: String,
      fold: DataFrame => DataFrame, minFolded: Int = 2): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val parts = batchDirs(conf, dir)
    if (parts.isEmpty) return false
    val maxId = parts.map(_._2).max
    val folded = parts.filter(_._2 != maxId)
    if (folded.size < minFolded) return false
    // plan exactly the data files under the folded partitions: a new
    // batch partition appended between plan and swap is never read,
    // never deleted (the compactPoints discipline)
    val planned = folded.flatMap(p => graft.core.Fs.dataFiles(conf, p._1.toString))
    if (planned.isEmpty) return false
    val tmp = s"$dir.compact_tmp"
    // partition-dir reads don't carry batch_id (a partition column), so
    // the folded frame has exactly the store's cell/count schema
    fold(spark.read.parquet(planned.map(_.toString): _*))
      .write.mode("overwrite").parquet(tmp)
    val snapDir = s"$dir/batch_id=$SnapshotBatchId"
    try {
      graft.core.Fs.swapInFiles(conf, tmp, snapDir, planned)
      // drop the now-empty folded partition dirs (the snapshot dir
      // itself just received the new files and stays)
      folded.map(_._1)
        .filter(_.getName != s"batch_id=$SnapshotBatchId")
        .foreach { p =>
          if (graft.core.Fs.dataFiles(conf, p.toString).isEmpty)
            p.getFileSystem(conf).delete(p, true): Unit
        }
    } finally {
      new Path(tmp).getFileSystem(conf).delete(new Path(tmp), true): Unit
    }
    true
  }

  /** Fold + RETENTION in one maintenance pass: compact the closed batch
   *  partitions, dropping rows that fail `retain` — the points-purge
   *  (R5) posture applied to a maintained summary store's TIME axis
   *  (the fold above bounds the BATCH axis; without this, a day-keyed
   *  store like the dds_daily grain grows one key set per day forever).
   *  Expired rows in the open (max, replayable) batch partition survive
   *  until a later pass closes it — the same tail the segment purge
   *  leaves in the live segment. Readers that filter their served range
   *  (e.g. the day-range percentile) are bit-identical before and after
   *  as long as `retain` keeps every day the range can reference. */
  def compactRetained(spark: SparkSession, dir: String,
      retain: org.apache.spark.sql.Column,
      fold: DataFrame => DataFrame): Boolean =
    compactBatchStore(spark, dir, df => fold(df.filter(retain)), minFolded = 1)

  /** Compact every maintained sketch store of an ingest lake: the
   *  count-min cell grid and each configured DDSketch bucket store.
   *  Merged reads ([[IngestJob.cmsCells]]/[[IngestJob.ddsBuckets]]) are
   *  bit-identical before and after — the fold IS the read-side merge,
   *  applied once and stored. */
  def compactSketches(spark: SparkSession, cfg: IngestJob.Config): Unit = {
    cfg.cms.foreach { _ =>
      compactBatchStore(spark, IngestJob.cmsPath(cfg),
        graft.operators.CountMin.merge): Unit
    }
    cfg.dds.foreach { c =>
      compactBatchStore(spark, IngestJob.ddsPath(cfg, c.name),
        graft.operators.QuantileSketch.merge): Unit
    }
  }

  /** Compact a [[DocIngest]] count store (columns = `keyCols` + `__c`):
   *  drift token counts (source, tk), PMI unigrams (tk) and pairs
   *  (w1, w2). */
  def compactCounts(spark: SparkSession, dir: String, keyCols: Seq[String]): Boolean = {
    import org.apache.spark.sql.functions._
    compactBatchStore(spark, dir,
      _.groupBy(keyCols.map(col): _*).agg(sum(col("__c")).as("__c")))
  }

  /** (partition dir, batch_id) pairs under a batch-partitioned root. */
  private def batchDirs(conf: Configuration, dir: String): Seq[(Path, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(s => s.getPath -> s.getPath.getName.stripPrefix("batch_id=").toLong)
  }
}
