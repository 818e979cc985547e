package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-partitioned count-store compaction: the fold must preserve the
 *  merged read bit-exactly, always exclude the max (replayable) batch
 *  partition, and re-fold its own snapshot on the next pass. */
class StoreCompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeBatch(dir: String, id: Long, rows: Seq[(String, Long)]): Unit =
    rows.toDF("tk", "__c").write.mode("overwrite").parquet(s"$dir/batch_id=$id")

  private def merged(dir: String): Map[String, Long] =
    spark.read.parquet(dir)
      .groupBy(col("tk")).agg(sum(col("__c")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def batchIds(dir: String): Set[Long] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).toSet

  test("fold preserves the merged read and excludes the max batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sc1").toString + "/store"
    writeBatch(dir, 0, Seq(("a", 2L), ("b", 1L)))
    writeBatch(dir, 1, Seq(("a", 3L), ("c", 5L)))
    writeBatch(dir, 2, Seq(("b", 7L)))
    val before = merged(dir)
    assert(StoreCompaction.compactCounts(spark, dir, Seq("tk")))
    assert(merged(dir) === before)
    // batches 0 and 1 folded into the snapshot; the max batch survives
    assert(batchIds(dir) === Set(StoreCompaction.SnapshotBatchId, 2L))
    // a replay of the max batch (dynamic overwrite of its partition)
    // still lands in its own partition and stays correctly counted
    writeBatch(dir, 2, Seq(("b", 7L), ("d", 1L)))
    assert(merged(dir) === before.updated("d", 1L))
  }

  test("the next pass re-folds the snapshot with newly closed batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sc2").toString + "/store"
    writeBatch(dir, 0, Seq(("a", 1L)))
    writeBatch(dir, 1, Seq(("a", 1L)))
    writeBatch(dir, 2, Seq(("a", 1L)))
    assert(StoreCompaction.compactCounts(spark, dir, Seq("tk")))
    writeBatch(dir, 3, Seq(("a", 1L), ("b", 2L)))
    writeBatch(dir, 4, Seq(("b", 2L)))
    assert(StoreCompaction.compactCounts(spark, dir, Seq("tk")))
    assert(batchIds(dir) === Set(StoreCompaction.SnapshotBatchId, 4L))
    assert(merged(dir) === Map("a" -> 4L, "b" -> 4L))
    // the snapshot is one aggregated row set, not concatenated partials
    assert(spark.read.parquet(s"$dir/batch_id=${StoreCompaction.SnapshotBatchId}")
      .groupBy(col("tk")).count().filter(col("count") > 1).isEmpty)
  }

  test("a store with nothing safely foldable is left untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sc3").toString + "/store"
    writeBatch(dir, 0, Seq(("a", 1L)))
    assert(!StoreCompaction.compactCounts(spark, dir, Seq("tk")))
    assert(batchIds(dir) === Set(0L))
    writeBatch(dir, 1, Seq(("a", 1L)))
    // two partitions: only batch 0 is closed — a single-partition fold
    // gains nothing and is skipped
    assert(!StoreCompaction.compactCounts(spark, dir, Seq("tk")))
    assert(batchIds(dir) === Set(0L, 1L))
    // an absent store is a no-op, not an error
    assert(!StoreCompaction.compactCounts(spark, dir + "_missing", Seq("tk")))
  }
}
