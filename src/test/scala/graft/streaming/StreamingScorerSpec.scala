package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingScorerSpec extends SparkSpec {
  import spark.implicits._

  test("streaming scorer matches the batch trailing-mean + APE semantics across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("series", "ts", "value")

    val scored = StreamingScorer.scoreDF(stream, window = 3)
    val query = scored.writeStream
      .format("memory")
      .queryName("stream_scores")
      .outputMode("append")
      .start()
    try {
      def t(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")
      // batch 1: warm-up (no full window yet)
      input.addData(("s", t(1), 10.0), ("s", t(2), 10.0), ("s", t(3), 10.0))
      query.processAllAvailable()
      // batch 2: state carries over — day4 forecast = mean(10,10,10)
      input.addData(("s", t(4), 20.0), ("s", t(5), 10.0))
      query.processAllAvailable()

      val rows = spark
        .table("stream_scores")
        .orderBy("ts")
        .collect()
        .map(r =>
          (
            r.getAs[java.sql.Timestamp]("ts"),
            Option(r.getAs[java.lang.Double]("predicted")).map(_.doubleValue),
            Option(r.getAs[java.lang.Double]("score")).map(_.doubleValue)
          )
        )
      assert(rows.length == 5)
      // first 3 points: insufficient history
      assert(rows.take(3).forall(r => r._2.isEmpty && r._3.isEmpty))
      // day4: predicted 10, value 20 -> ape 0.5
      assert(rows(3)._2.contains(10.0))
      assert(rows(3)._3.exists(s => math.abs(s - 0.5) < 1e-9))
      // day5: predicted mean(10,10,20)=40/3, value 10 -> ape |10-40/3|/10
      val p5 = (10.0 + 10.0 + 20.0) / 3
      assert(rows(4)._2.exists(p => math.abs(p - p5) < 1e-9))
      assert(rows(4)._3.exists(s => math.abs(s - math.abs(10.0 - p5) / 10.0) < 1e-9))
    } finally query.stop()
  }

  test("a cross-batch late event is emitted unscored and does not corrupt state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val scored = StreamingScorer.scoreDF(input.toDF().toDF("series", "ts", "value"), window = 2)
    val query = scored.writeStream
      .format("memory").queryName("stream_late").outputMode("append").start()
    try {
      def t(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")
      input.addData(("s", t(1), 10.0), ("s", t(2), 10.0), ("s", t(4), 10.0))
      query.processAllAvailable()
      // ts=3 arrives AFTER ts=4 was consumed: must not be scored
      // against a window containing its future, must not enter state
      input.addData(("s", t(3), 99.0), ("s", t(5), 10.0))
      query.processAllAvailable()
      val rows = spark.table("stream_late").orderBy("ts").collect()
      val late = rows.find(_.getAs[java.sql.Timestamp]("ts") == t(3)).get
      assert(late.getAs[java.lang.Double]("predicted") == null)
      // day 5: state is (10,10) from days 2,4 — the late 99 never entered
      val d5 = rows.find(_.getAs[java.sql.Timestamp]("ts") == t(5)).get
      assert(d5.getAs[Double]("predicted") == 10.0)
      assert(d5.getAs[Double]("score") == 0.0)
    } finally query.stop()
  }

  test("streaming assessment joins static thresholds and alerts on exceedance and unscorable points") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val scored = StreamingScorer.scoreDF(input.toDF().toDF("series", "ts", "value"), window = 2)
    val thresholds = Seq(("a", 0.1)).toDF("series", "threshold")
    val assessed = StreamingScorer.assessDF(scored, thresholds)
    val q = assessed.writeStream.format("memory").queryName("stream_assess").outputMode("append").start()
    try {
      def t(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")
      input.addData(("a", t(1), 10.0), ("a", t(2), 10.0), ("a", t(3), 10.0), ("a", t(4), 30.0))
      q.processAllAvailable()
      val rows = spark.table("stream_assess").orderBy("ts").collect()
      // days 1-2: no forecast -> unscorable -> alerts (fail-loud)
      assert(rows(0).getAs[Boolean]("is_anomalous"))
      // day 3: forecast 10, value 10 -> score 0 -> healthy
      assert(!rows(2).getAs[Boolean]("is_anomalous"))
      // day 4: forecast 10, value 30 -> score ~0.667 > 0.1 -> alert
      assert(rows(3).getAs[Boolean]("is_anomalous"))
    } finally q.stop()
  }

  test("state is bounded per series and independent between series") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val scored = StreamingScorer.scoreDF(input.toDF().toDF("series", "ts", "value"), window = 2)
    val query = scored.writeStream
      .format("memory")
      .queryName("stream_scores2")
      .outputMode("append")
      .start()
    try {
      def t(day: Int) = java.sql.Timestamp.valueOf(f"2025-01-$day%02d 00:00:00")
      input.addData(
        ("a", t(1), 1.0), ("a", t(2), 1.0), ("a", t(3), 1.0),
        ("b", t(1), 100.0), ("b", t(2), 100.0), ("b", t(3), 50.0)
      )
      query.processAllAvailable()
      val rows = spark.table("stream_scores2")
        .where($"ts" === t(3))
        .collect()
        .map(r => r.getAs[String]("series") -> r.getAs[java.lang.Double]("score"))
        .toMap
      assert(rows("a") == 0.0) // constant series: perfect forecast
      assert(math.abs(rows("b") - 1.0) < 1e-9) // |50-100|/50 = 1 (clamped)
    } finally query.stop()
  }
}
