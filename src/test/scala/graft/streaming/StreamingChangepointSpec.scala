package graft.streaming

import graft.SparkSpec
import graft.anomaly.Changepoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")

  // the planted level shift: ~1 sigma up from day 6 — no single point
  // is extreme, the accumulated drift is
  private val values =
    Seq(10.0, 12.0, 11.0, 10.0, 11.0, 15.0, 16.0, 15.0, 16.0, 15.0, 16.0, 17.0)

  private def sampleStats(vs: Seq[Double]): (Double, Double) = {
    val n = vs.size
    val mean = vs.sum / n
    val std = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    (mean, std)
  }

  private def batchRows: Seq[(java.sql.Timestamp, Double, Double, Double, Boolean)] = {
    val df = values.zipWithIndex
      .map { case (v, i) => ("m", t(i + 1), v) }
      .toDF("series", "ts", "value")
    Changepoint
      .cusum(df, Seq("series"), slack = 0.5, threshold = 2.0)
      .orderBy("ts")
      .select("ts", "z", "cusum_pos", "cusum_neg", "alarm")
      .as[(java.sql.Timestamp, Double, Double, Double, Boolean)]
      .collect()
      .toSeq
  }

  test("streaming fold equals the batch drawdown form and raises the same alarm") {
    implicit val sqlCtx = spark.sqlContext
    val (mean, std) = sampleStats(values)
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val ref = Seq(("m", mean, std), ("wm", 0.0, 1.0)).toDF("series", "mean", "std")
    val out = StreamingChangepoint.detectDF(
      input.toDF().toDF("series", "ts", "value"),
      ref,
      slack = 0.5,
      threshold = 2.0
    )
    val query = out.writeStream
      .format("memory").queryName("stream_cusum_eq").outputMode("append").start()
    try {
      val pts = values.zipWithIndex.map { case (v, i) => ("m", t(i + 1), v) }
      input.addData(pts.take(7): _*)
      query.processAllAvailable()
      input.addData(pts.drop(7): _*)
      query.processAllAvailable()
      input.addData(("wm", t(28), 0.0)) // push the watermark past day 12
      query.processAllAvailable()
      val streamed = spark
        .table("stream_cusum_eq")
        .where($"series" === "m")
        .orderBy("ts")
        .select("ts", "z", "cusum_pos", "cusum_neg", "alarm")
        .as[(java.sql.Timestamp, Double, Double, Double, Boolean)]
        .collect()
        .toSeq
      assert(streamed == batchRows)
      assert(streamed.exists(_._5), "the planted shift must alarm")
      assert(!streamed.take(3).exists(_._5), "the opening points stay quiet")
    } finally query.stop()
  }

  test("out-of-order arrival within the delay folds in timestamp order") {
    implicit val sqlCtx = spark.sqlContext
    val (mean, std) = sampleStats(values)
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val ref = Seq(("m", mean, std), ("wm", 0.0, 1.0)).toDF("series", "mean", "std")
    val out = StreamingChangepoint.detectDF(
      input.toDF().toDF("series", "ts", "value"),
      ref,
      slack = 0.5,
      threshold = 2.0,
      delayThreshold = "30 days"
    )
    val query = out.writeStream
      .format("memory").queryName("stream_cusum_ooo").outputMode("append").start()
    try {
      val pts = values.zipWithIndex.map { case (v, i) => ("m", t(i + 1), v) }
      // days 3.. first, then the opening days LATE but inside the delay
      input.addData(pts.drop(2): _*)
      query.processAllAvailable()
      input.addData(pts.take(2): _*)
      query.processAllAvailable()
      // push the watermark past day 12 + the 30-day delay
      input.addData(("wm", java.sql.Timestamp.valueOf("2025-04-01 00:00:00"), 0.0))
      query.processAllAvailable()
      val streamed = spark
        .table("stream_cusum_ooo")
        .where($"series" === "m")
        .orderBy("ts")
        .select("ts", "z", "cusum_pos", "cusum_neg", "alarm")
        .as[(java.sql.Timestamp, Double, Double, Double, Boolean)]
        .collect()
        .toSeq
      assert(streamed == batchRows, "arrival order must not change the fold")
    } finally query.stop()
  }

  test("series missing from the reference are dropped, not folded at z=0") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val ref = Seq(("known", 0.0, 1.0)).toDF("series", "mean", "std")
    val out = StreamingChangepoint.detectDF(
      input.toDF().toDF("series", "ts", "value"), ref)
    val query = out.writeStream
      .format("memory").queryName("stream_cusum_ref").outputMode("append").start()
    try {
      input.addData(("ghost", t(1), 99.0), ("known", t(2), 1.0))
      query.processAllAvailable()
      input.addData(("known", t(20), 0.0))
      query.processAllAvailable()
      val series = spark.table("stream_cusum_ref").select("series")
        .as[String].collect().toSet
      assert(series == Set("known"))
    } finally query.stop()
  }
}
