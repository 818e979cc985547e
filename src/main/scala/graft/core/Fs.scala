package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem ops for the maintenance paths (log compaction, partition
 *  swap). Everything goes through the Hadoop FileSystem API so purge and
 *  compaction work on HDFS/S3-style stores, not just local disk. */
object Fs {

  def hadoopConf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Atomic-ish directory swap (rename is atomic on HDFS; on object
   *  stores a table format would own this — the API boundary is what
   *  matters here). NOTE: deletes everything currently under `dst`,
   *  including files appended after the caller read it — only safe when
   *  the caller holds exclusive ownership of the directory. For
   *  concurrently-appended dirs use [[swapInFiles]]. */
  def replaceDir(conf: Configuration, src: String, dst: String): Unit = {
    val dstPath = new Path(dst)
    val fs = dstPath.getFileSystem(conf)
    if (fs.exists(dstPath) && !fs.delete(dstPath, true))
      throw new java.io.IOException(s"delete $dst failed")
    if (!fs.rename(new Path(src), dstPath))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  /** The data files (non-hidden, non-marker) directly under `dir`. */
  def dataFiles(conf: Configuration, dir: String): Seq[Path] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
  }

  /** Recursive directory copy (FileUtil.copy semantics: a non-existent
   *  `dst` becomes the copy itself). Harness/test use — production
   *  compaction rewrites in place. */
  def copyDir(conf: Configuration, src: String, dst: String): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    if (!org.apache.hadoop.fs.FileUtil.copy(
        s.getFileSystem(conf), s, d.getFileSystem(conf), d, false, conf))
      throw new java.io.IOException(s"copy $src -> $dst failed")
  }

  /** Race-safe rewrite swap for a directory other writers may append to
   *  concurrently: move the staged replacement files INTO `liveDir`
   *  (Spark part-file names are task-UUID-unique, so no collisions), then
   *  delete exactly the files the caller planned the rewrite over — never
   *  the whole directory. A file appended between plan time and the swap
   *  is neither deleted nor double-counted (the rewrite read only the
   *  planned files). Crash window: after the move-in, before the deletes,
   *  both copies briefly coexist — readers' (ts, seq) last-write-wins
   *  fold collapses such duplicates, which is the safe failure direction
   *  (replaceDir's window loses data instead). */
  def swapInFiles(conf: Configuration, stagingDir: String, liveDir: String,
      plannedOld: Seq[Path]): Unit = {
    val live = new Path(liveDir)
    val fs = live.getFileSystem(conf)
    if (!fs.exists(live) && !fs.mkdirs(live))
      throw new java.io.IOException(s"mkdirs $liveDir failed")
    dataFiles(conf, stagingDir).foreach { f =>
      if (!fs.rename(f, new Path(live, f.getName)))
        throw new java.io.IOException(s"rename $f into $liveDir failed")
    }
    plannedOld.foreach { f =>
      if (fs.exists(f) && !fs.delete(f, false))
        throw new java.io.IOException(s"delete $f failed")
    }
  }
}
