package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev utility: job-count + phase profile of the bench's incremental
  * pipeline (3 hash-split batches through pipelines.Incremental with
  * cross-batch exact + near dedup, then corpus read-back and state
  * compaction) — the evidence base for deciding whether its wall time
  * is removable passes or the accumulated-state design cost
  * (VERDICT r14 item 4).
  *
  * Usage: runMain graft.tools.IncrementalProfile <sfDir>
  */
object IncrementalProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: IncrementalProfile <sfDir>")
    val sfDir = args(0)
    val spark = graft.LocalSession.create("ERROR")
    try {
      spark.range(1000000).selectExpr("sum(id)").count()
      graft.SparkEntry.queries("text_quality")(spark, sfDir).count()
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.catalog.clearCache()
    System.gc()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.get("INCR_PROFILE_VERBOSE").contains("1")
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = Option(jobStart.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          println(s"INCRJOB ${jobStart.jobId} stages=${jobStart.stageInfos.size} $site")
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def phase[A](name: String)(body: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = body
      // listener events are async; give the bus a moment to drain
      // (job starts are posted synchronously with submission, so a
      // short settle is enough for a counting profile)
      Thread.sleep(200)
      println(
        f"INCR $name%-22s jobs=${jobs.get() - j0}%3d wall=${(System.nanoTime() - t0) / 1e9}%7.3f"
      )
      r
    }
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val root = java.nio.file.Files.createTempDirectory("incr_prof").toString
    val docs = graft.Tables.documents(spark, sfDir)
    (0 until 3).foreach { b =>
      phase(s"prepareBatch day$b") {
        graft.pipelines.Incremental.prepareBatch(
          docs.where(pmod(col("doc_id"), lit(3)) === b),
          root,
          s"day$b",
          nearDupThreshold = Some(0.5)
        )
      }
    }
    phase("preparedCorpus.count") {
      graft.pipelines.Incremental.preparedCorpus(spark, root).count()
    }
    phase("compactState") {
      graft.pipelines.Incremental.compactState(spark, root, targetFiles = 4)
    }
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    println(s"INCR total jobs=${jobs.get()}")
    spark.stop()
  }
}
