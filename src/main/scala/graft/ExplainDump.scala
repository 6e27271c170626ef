package graft

/** Dump `explain("formatted")` of registered queries to files — the
  * plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [query...]
  * Writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainDump <sfDir> <outDir> <suffix> <query>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val spark = LocalSession.create("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
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
