package graft

/** Dev utility: phase-profile registered queries.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <queryName> [queryName...]
  *
  * For each query, after an untimed warm rep (JIT + codegen cache +
  * parquet footers, the same discipline as [[TimeQuery]]), one timed
  * rep is decomposed into:
  *   - construct: building the DataFrame (includes any plan-time driver
  *     work the operator does — eager fits, materialize() calls)
  *   - analysis/optimization/planning: Catalyst phases from the
  *     QueryPlanningTracker of the final count() job
  *   - total: wall clock of construct + count()
  *
  * Output is one parseable line per query so a sweep can be diffed.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQuery <sfDir> <queryName>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = LocalSession.create("ERROR")
    try {
      spark.range(1000000).selectExpr("sum(id)").count()
      SparkEntry.queries("text_quality")(spark, sfDir).count()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.catalog.clearCache()
    System.gc()
    // job counter (r15): a key's wall time at local test scale is
    // ≈ jobs × the 150-400 ms scheduler floor, so the count is the
    // first-order explanation of every profile line
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm rep (untimed); a failing query skips ONLY itself — a
      // `return` here would be a non-local return from main, silently
      // aborting every remaining query and spark.stop() (r14 ADVICE)
      val warmOk =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            println(s"PROFILE $n ERROR ${e.getClass.getSimpleName}"); false
        }
      if (warmOk) {
        spark.catalog.clearCache()
        System.gc()
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tConstruct = (System.nanoTime() - t0) / 1e9
        val jConstruct = jobs.get() - j0
        val t1 = System.nanoTime()
        df.count()
        val tCount = (System.nanoTime() - t1) / 1e9
        Thread.sleep(100) // let async job-start events drain
        val jTotal = jobs.get() - j0
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}" }
          .toSeq
          .sorted
          .mkString(" ")
        println(
          f"PROFILE $n%-34s total=${tConstruct + tCount}%7.3f construct=$tConstruct%7.3f exec=$tCount%7.3f jobs=$jTotal%3d (construct $jConstruct%2d)  $phases"
        )
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
