package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + classloading + parquet footer caches would
    // otherwise be billed to whichever query happens to run first.
    try {
      spark.range(1000000).selectExpr("sum(id)").count()
      SparkEntry.entry(spark).count()
      SparkEntry.queries("text_quality")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // A query that throws must be visibly red: its wall-time is recorded
    // as -1 and its name lands in "errors" — never a fake timing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        (name, (System.nanoTime() - t0) / 1e9, None: Option[String])
      } catch {
        case e: Throwable => (name, -1.0, Some(e.getClass.getSimpleName))
      }
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, Some(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    )
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
