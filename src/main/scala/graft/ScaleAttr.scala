package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/**
 * Attribution harness for scale-probe anomalies: runs named declared
 * queries against prepared corpus dirs (e.g. the GRAFT_SCALE4_DIR
 * event tables) with a stage-metrics listener, printing per-stage
 * spill / shuffle / input volumes alongside wall time — the evidence
 * that NAMES a super-linear decade instead of guessing at it.
 *
 * Usage:
 *   sbt "runMain graft.ScaleAttr <dir1> [dir2 ...] -- <query> [query ...]"
 * Env:
 *   GRAFT_ATTR_PARTITIONS — override spark.sql.shuffle.partitions (and
 *     AQE's initialPartitionNum) for an A/B against the pinned 32.
 */
object ScaleAttr {

  private final class StageMetrics extends SparkListener {
    case class Row(stage: Int, name: String, tasks: Int, runMs: Long,
      spillMem: Long, spillDisk: Long, shufWrite: Long, shufRead: Long,
      input: Long, peakMem: Long)
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(60),
        si.numTasks, m.executorRunTime,
        m.memoryBytesSpilled, m.diskBytesSpilled,
        m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
        m.inputMetrics.bytesRead, m.peakExecutionMemory)
    }
    def reset(): Unit = rows.clear()
    def dump(): Unit = {
      println(f"  ${"stage"}%-62s ${"tasks"}%5s ${"run_s"}%8s ${"spillMem"}%9s ${"spillDsk"}%9s ${"shufW"}%8s ${"shufR"}%8s ${"input"}%8s ${"peakTask"}%9s")
      def gb(b: Long): String = f"${b / 1e9}%.2fg"
      for (r <- rows.sortBy(_.stage)) println(
        f"  s${r.stage}%-4d ${r.name}%-56s ${r.tasks}%5d ${r.runMs / 1e3}%8.1f ${gb(r.spillMem)}%9s ${gb(r.spillDisk)}%9s ${gb(r.shufWrite)}%8s ${gb(r.shufRead)}%8s ${gb(r.input)}%8s ${gb(r.peakMem)}%9s")
      val totSpill = rows.map(_.spillDisk).sum
      val totShuf = rows.map(_.shufWrite).sum
      println(f"  TOTAL disk spill ${totSpill / 1e9}%.2f GB, shuffle write ${totShuf / 1e9}%.2f GB")
    }
  }

  def main(args: Array[String]): Unit = {
    val sep = args.indexOf("--")
    require(sep > 0 && sep < args.length - 1,
      "usage: ScaleAttr <dir...> -- <query...>")
    val dirs = args.take(sep).toSeq
    val names = args.drop(sep + 1).toSeq
    val b = graft.core.GraftSession.builder().appName("graft-scale-attr")
    val parts = sys.env.get("GRAFT_ATTR_PARTITIONS")
    parts.foreach { p =>
      b.config("spark.sql.shuffle.partitions", p)
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", p)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"shuffle.partitions=${spark.conf.get("spark.sql.shuffle.partitions")}" +
      parts.map(p => s" initialPartitionNum=$p").getOrElse("") +
      s" heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}m")
    // generate a missing events dir on demand when it follows the
    // ScaleProbe xl4 naming convention (.../e<N>), so ceiling probes
    // beyond the prepared decades need no separate generation step
    val EvDir = """.*/e(\d+)$""".r
    for (d <- dirs
         if !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet")))
      d match {
        case EvDir(n) =>
          val rows = n.toLong
          println(s"generating $rows events at $d")
          ScaleProbe.genEventsDistributed(spark, rows, (rows / 666).toInt.max(150), d)
        case _ => throw new IllegalArgumentException(s"no events.parquet under $d")
      }
    val listener = new StageMetrics
    spark.sparkContext.addSparkListener(listener)
    val queries = SparkEntry.queries ++ ScaleProbe.ProbeOnly
    for (q <- names; qf = queries(q)) {
      qf(spark, dirs.head).count() // warm JIT + listing on the smallest dir
      spark.catalog.clearCache()
      for (d <- dirs) {
        Thread.sleep(200) // let straggling listener events drain
        listener.reset()
        val t0 = System.nanoTime()
        val rows = qf(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Thread.sleep(500)
        println(f"\n$q @ $d: $sec%.2f s, $rows rows")
        listener.dump()
      }
    }
    spark.stop()
  }
}
