package graft

/** Dump `explain("formatted")` of registered queries to files — the
  * plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [--executed] [query...]
  * Writes `<outDir>/<query>_<suffix>.txt` per query.
  *
  * `--executed` (r15, VERDICT r14 item 5): run the plan to completion
  * FIRST (an RDD action on the query's own executedPlan, so the very
  * QueryExecution being dumped is the one that ran), then dump — under
  * AQE the static plan cannot show runtime artifacts like
  * `ReusedExchange` or `AQEShuffleRead`, so claims that rest on runtime
  * exchange reuse need the post-action final plan
  * (`isFinalPlan=true`), not the `isFinalPlan=false` template.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainDump <sfDir> <outDir> <suffix> [--executed] <query>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val executed = args.contains("--executed")
    val names = args.drop(3).filterNot(_ == "--executed").toSeq
    val spark = LocalSession.create("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (executed) {
          // drive THIS QueryExecution's adaptive plan to its final
          // shape; count() would plan a different (pruned) query
          df.queryExecution.executedPlan.execute().count()
        }
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode
        )
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt
        )
        println(s"[explain] wrote $n")
      } catch {
        case e: Throwable => println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
