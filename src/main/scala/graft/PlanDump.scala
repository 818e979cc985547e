package graft

/** Dumps `.explain("formatted")` for named declared queries to files —
 *  the optimization-round evidence format (`plans/r15/<query>_{before,after}.txt`).
 *
 *  Usage: sbt "runMain graft.PlanDump <outDir> <suffix> <query> [query ...]"
 *  writes `<outDir>/<query>_<suffix>.txt` for each query, built against
 *  `$SPARK_GRAFT_SF_DIR` (default sf0.1 — the bench scale, so plan
 *  choices like broadcast-vs-SMJ match what the bench measures).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = graft.core.GraftSession.builder().appName("graft-plan-dump")
    // before/after dumps: GRAFT_PLAN_CONF="k=v;k=v" overlays session confs
    sys.env.get("GRAFT_PLAN_CONF").foreach(_.split(';').filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      System.err.println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
