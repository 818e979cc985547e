package graft

/** Driver-run benchmark: every registered query at the bench SF, full-row
 *  materialization through the noop sink (so Catalyst can't prune the
 *  final projection the way `count()` lets it), one untimed warmup to
 *  absorb JVM/codegen startup, then per-query median of 3 runs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: one representative multi-stage query
    try exec("q_groupby") catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { exec(name); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
        finally spark.catalog.clearCache() // each run pays its own persists
      }.sorted
      name -> times(1) // median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
