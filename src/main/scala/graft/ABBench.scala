package graft

/** Interleaved same-JVM A/B bench for runtime SQLConf variants — the only
 *  comparison methodology that survives this host's documented ±10-15%
 *  run-to-run drift (STATUS round-13/14 notes): both variants of a query
 *  run back-to-back inside one pass, passes repeat round-robin over the
 *  whole list, and each (query, variant) records its min across passes.
 *
 *  Usage:
 *    GRAFT_AB_CONFS="k=v;k=v|k=v" sbt "runMain graft.ABBench <q> [q ...]"
 *  `|` separates variants (variant 0 = first). Reps via GRAFT_AB_REPS
 *  (default 3). Env SPARK_GRAFT_SF_DIR as Bench.
 */
object ABBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ABBench <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("GRAFT_AB_REPS").map(_.toInt).getOrElse(3)
    val variants: Seq[Seq[(String, String)]] =
      sys.env.getOrElse("GRAFT_AB_CONFS", "").split('|').toSeq.map(
        _.split(';').filter(_.nonEmpty).toSeq.map { kv =>
          val Array(k, v) = kv.split("=", 2); (k, v)
        })
    require(variants.size >= 2, "need >= 2 |-separated variants in GRAFT_AB_CONFS")
    val spark = graft.core.GraftSession.builder().appName("graft-ab-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }
    // warmup
    try timed("q_groupby") catch { case _: Throwable => () }

    val names = args.toSeq
    val best = scala.collection.mutable.Map.empty[(String, Int), Double]
      .withDefaultValue(Double.MaxValue)
    for (pass <- 1 to reps; name <- names) {
      // alternate variant order per pass so neither always runs cold
      val order = if (pass % 2 == 1) variants.indices else variants.indices.reverse
      for (vi <- order) {
        variants(vi).foreach { case (k, v) => spark.conf.set(k, v) }
        val t = try timed(name) catch { case _: Throwable => -1.0 }
        if (t >= 0) best((name, vi)) = math.min(best((name, vi)), t)
        System.err.println(f"[ab] pass $pass v$vi $name%-32s $t%8.3f s")
      }
    }
    println(f"${"query"}%-34s" + variants.indices.map(i => f"      v$i%d").mkString + "   delta(v1-v0)")
    val tot = Array.fill(variants.size)(0.0)
    for (name <- names) {
      val vs = variants.indices.map(i => best((name, i)))
      variants.indices.foreach(i => tot(i) += vs(i))
      println(f"$name%-34s" + vs.map(v => f" $v%7.3f").mkString + f"   ${vs(1) - vs(0)}%+7.3f")
    }
    println(f"${"TOTAL"}%-34s" + tot.map(v => f" $v%7.1f").mkString)
    spark.stop()
  }
}
