package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Phase-attribution profiler for declared queries: splits a query's wall
 *  time into DataFrame construction, Catalyst planning (analyze→physical),
 *  and execution (noop write), plus executor task-time and stage/job
 *  counts from a listener — the evidence that separates driver-side fixed
 *  overhead (planning, codegen) from genuine execution cost.
 *
 *  Usage: sbt "runMain graft.QueryProfile <query> [query ...]"
 *  Env: SPARK_GRAFT_SF_DIR (default sf0.1). Each query runs twice; both
 *  runs print (run 1 carries first-touch costs: codegen cache, file
 *  listing; run 2 is the steady state the bench's min-of-2 reports).
 */
object QueryProfile {
  private final class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1; tasks += s.stageInfo.numTasks
      taskMs += s.stageInfo.taskMetrics.executorRunTime
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskMs = 0 }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = graft.core.GraftSession.builder().appName("graft-query-profile")
    // A/B hook: GRAFT_PROFILE_CONF="k=v;k=v" overlays session confs
    sys.env.get("GRAFT_PROFILE_CONF").foreach(_.split(';').filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)
    // absorb session-level first-touch (extensions, codegen of a warmup)
    SparkEntry.queries("q_groupby")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"${"query"}%-32s run ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s")
    for (name <- args; run <- 1 to 2) {
      counts.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      spark.catalog.clearCache()
      def s(a: Long, b: Long): Double = (b - a) / 1e9
      println(f"$name%-32s   $run ${s(t0, t1)}%7.2f ${s(t1, t2)}%7.2f ${s(t2, t3)}%7.2f ${s(t0, t3)}%7.2f ${counts.jobs}%5d ${counts.stages}%6d ${counts.tasks}%6d ${counts.taskMs / 1e3}%8.1f")
    }
    spark.stop()
  }
}
