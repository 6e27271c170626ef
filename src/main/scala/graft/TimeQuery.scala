package graft

/** Dev utility: time individual registered queries.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <queryName> [queryName...]
  *
  * Same warmup discipline as [[Bench]] (JIT + parquet footer caches
  * primed by an untimed pass) so a single-query measurement is
  * comparable to its bench_detail.json entry.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <queryName>...")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = LocalSession.create("ERROR")
    // guarded like Bench's warmup: a data dir without the documents
    // table must not kill the tool before any timing runs
    try {
      spark.range(1000000).selectExpr("sum(id)").count()
      SparkEntry.queries("text_quality")(spark, sfDir).count()
    } catch { case scala.util.control.NonFatal(_) => () }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm the exact query path once
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"TIMED $n%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($rows rows)")
    }
    spark.stop()
  }
}
