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
   *  matters here). */
  def replaceDir(conf: Configuration, src: String, dst: String): Unit = {
    val dstPath = new Path(dst)
    val fs = dstPath.getFileSystem(conf)
    if (fs.exists(dstPath) && !fs.delete(dstPath, true))
      throw new java.io.IOException(s"delete $dst failed")
    if (!fs.rename(new Path(src), dstPath))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }
}
