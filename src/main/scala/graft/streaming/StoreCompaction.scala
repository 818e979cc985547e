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
 * Crash safety: unlike the LWW logs, a counts-are-sums read does NOT
 * collapse duplicates, so the swap cannot tolerate a window where the
 * folded snapshot and the source partials coexist durably. The fold
 * therefore (a) writes the snapshot as ONE file, moved in by a single
 * atomic rename — no partially-visible snapshot state exists — and (b)
 * brackets the swap with a manifest (`_fold_manifest` inside the
 * snapshot partition; the underscore prefix hides it from parquet
 * readers): manifest committed → snapshot renamed in → sources deleted
 * → manifest removed. [[recover]] replays an interrupted swap from the
 * manifest — snapshot present ⇒ finish the deletes; snapshot absent ⇒
 * abort (sources intact, nothing lost) — and runs automatically at the
 * start of every fold and in the engine's maintained-store readers
 * ([[IngestJob.cmsCells]]/[[IngestJob.ddsBuckets]]), so a crashed swap
 * heals before any sum can double.
 *
 * Concurrency: run the fold as a maintenance pass (in-band between
 * triggers via `compactEvery`, or offline on the closed prefix). The
 * swap never touches a concurrently-appended new batch partition; a
 * reader overlapping the brief rename→delete window of a LIVE fold
 * could still see a folded batch twice — in-band folds run inside
 * foreachBatch where the engine's own readers cannot overlap.
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
    recover(conf, dir) // heal any swap a crash interrupted (see scaladoc)
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
    // the folded frame has exactly the store's cell/count schema; ONE
    // output file so the move-in below is a single atomic rename (the
    // relation is summary-sized by construction)
    fold(spark.read.parquet(planned.map(_.toString): _*))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val snapDir = new Path(s"$dir/batch_id=$SnapshotBatchId")
    val fs = snapDir.getFileSystem(conf)
    try {
      val staged = graft.core.Fs.dataFiles(conf, tmp) match {
        case Seq(one) => one
        case other => throw new java.io.IOException(
          s"expected one staged snapshot file, found ${other.size} under $tmp")
      }
      if (!fs.exists(snapDir) && !fs.mkdirs(snapDir))
        throw new java.io.IOException(s"mkdirs $snapDir failed")
      // unique target name: the previous snapshot file is among `planned`
      // and must coexist until the swap completes
      val target = new Path(snapDir, s"fold-${java.util.UUID.randomUUID}.parquet")
      // 1. commit the manifest (temp + atomic rename)
      writeManifest(fs, manifestPath(dir), target, planned)
      // 2. the single atomic move-in
      if (!fs.rename(staged, target))
        throw new java.io.IOException(s"rename $staged -> $target failed")
      // 3. delete the folded sources, 4. drop the manifest
      finishSwap(fs, dir, target, planned)
    } finally {
      fs.delete(new Path(tmp), true): Unit
    }
    true
  }

  private def manifestPath(dir: String): Path =
    new Path(s"$dir/batch_id=$SnapshotBatchId/_fold_manifest")

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, mf: Path,
      target: Path, planned: Seq[Path]): Unit = {
    val tmp = new Path(mf.getParent, "_fold_manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write((target.toString +: planned.map(_.toString))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(mf, false)
    if (!fs.rename(tmp, mf))
      throw new java.io.IOException(s"manifest commit $mf failed")
  }

  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      target: Path, planned: Seq[Path]): Unit = {
    planned.foreach { f =>
      if (fs.exists(f) && !fs.delete(f, false))
        throw new java.io.IOException(s"delete $f failed")
    }
    // drop now-empty folded partition dirs (not the snapshot's own)
    planned.map(_.getParent).distinct
      .filter(p => p.getName != s"batch_id=$SnapshotBatchId")
      .foreach { p =>
        if (fs.exists(p) && graft.core.Fs.dataFiles(fs.getConf, p.toString).isEmpty)
          fs.delete(p, true): Unit
      }
    fs.delete(manifestPath(dir), false): Unit
  }

  /** Replay a swap a crash interrupted, from its committed manifest:
   *  snapshot file present ⇒ the fold is durable, finish the source
   *  deletes; absent ⇒ abort (sources were never removed — nothing is
   *  lost, the next fold redoes the work). Idempotent and cheap when no
   *  manifest exists (one existence probe); called by every fold entry
   *  and by the engine's maintained-store readers. */
  def recover(conf: Configuration, dir: String): Unit = {
    val mf = manifestPath(dir)
    val fs = mf.getFileSystem(conf)
    if (!fs.exists(mf)) return
    val in = fs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    lines match {
      case targetStr :: plannedStrs =>
        val target = new Path(targetStr)
        if (fs.exists(target)) finishSwap(fs, dir, target, plannedStrs.map(new Path(_)))
        else fs.delete(mf, false): Unit
      case Nil => fs.delete(mf, false): Unit
    }
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
