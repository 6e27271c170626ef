package graft.tools

/** Dev utility: N-rep A/B timing for registered queries with EXACTLY
  * the bench's per-key discipline (global warmup, clearCache between
  * reps, GC between keys, cold first rep per key) so its numbers are
  * comparable to bench_detail.json medians. Prints every raw rep plus
  * median and min — the robust statistics an A/B decision needs when
  * the host carries intermittent external load.
  *
  * Usage: runMain graft.tools.ABQuery <sfDir> <reps> [--noop] <queryName>...
  * Flip the variable under test via env (e.g. SPARK_GRAFT_SPREAD).
  *
  * `--noop` times the noop sink instead of count() (guide §1.4):
  * count() lets the optimizer prune columns and — through unique-key
  * outer joins — entire subtrees, so for some keys it measures a
  * fraction of the declared computation; the noop sink computes every
  * column of every row.
  */
object ABQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ABQuery <sfDir> <reps> [--noop] <queryName>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val noop = args.contains("--noop")
    val names = args.drop(2).filterNot(_ == "--noop").toSeq
    val spark = graft.LocalSession.create("ERROR")
    try {
      spark.range(1000000).selectExpr("sum(id)").count()
      graft.SparkEntry.queries("text_quality")(spark, sfDir).count()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.catalog.clearCache()
    System.gc()
    val spreadConf = spark.conf.getOption("graft.spread.enabled").getOrElse("unset")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        if (noop)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        else fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      System.gc()
      val sorted = ts.sorted
      println(
        f"AB $n%-34s median=${sorted(reps / 2)}%7.3f min=${sorted.head}%7.3f " +
          f"reps=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")} spread=$spreadConf"
      )
    }
    spark.stop()
  }
}
