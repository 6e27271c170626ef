package graft.examples

import graft.anomaly.Optimizer
import graft.profiler.ProfilingBuilder
import graft.repository.InMemoryRepository
import graft.service.Service
import graft.testing.SyntheticSeries
import org.apache.spark.sql.SparkSession

/** End-to-end quickstart — the reference README's A/B/C flow on graft:
  *
  *  A. profile raw batches into the Metrics Repository,
  *  B. optimize per-metric forecast models + thresholds from history,
  *  C. score the newest batch and alert when a score exceeds its
  *     threshold.
  *
  * Run: sbt "runMain graft.examples.Quickstart"
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val repo = new InMemoryRepository()
    val uri = "s3://lake/temperatures"

    // A: 60 days of history, profiled in one pass and upserted.
    val history = SyntheticSeries.daily(spark, 60)
    Service.profileCreate(history, uri, "ts", repo, ProfilingBuilder.simple)

    // B: distributed model selection + threshold optimization per metric.
    val optimization = Service.optimize(uri, repo, Optimizer.Config())
    println("=== optimization ===")
    optimization.show(truncate = false)

    // C: a new batch arrives with a 2.5x spike on its last day.
    val withSpike = SyntheticSeries.daily(spark, 61, anomalies = Map(60 -> 2.5))
    val assessment = Service.assessNewTs(withSpike, uri, "ts", repo, ProfilingBuilder.simple)
    println(s"=== assessment: healthy=${assessment.isHealthy} ===")
    assessment.anomalous.foreach(a => println(s"  ANOMALY: $a"))

    // D: static HTML dashboard (the reference UI's views, server-less):
    // the dataset browser index plus one report page per dataset.
    val pages = graft.report.HtmlReport.writeAll(repo, "/tmp/graft-quickstart-report")
    println(s"=== reports written: ${pages.mkString(", ")} ===")

    spark.stop()
  }
}
