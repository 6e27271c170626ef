package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingEventFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private def startQuery(
      input: MemoryStream[(Long, String, java.sql.Timestamp)],
      name: String,
      delay: String
  ) = {
    val completions = StreamingEventFunnel.completionsDF(
      input.toDF().toDF("user_id", "event_type", "ts"),
      "event_type",
      "user_id",
      "ts",
      Seq("view", "click", "purchase"),
      delayThreshold = delay
    )
    completions.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
  }

  private def rows(name: String): Set[(Long, Int, String)] =
    spark
      .table(name)
      .collect()
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[Int]("step_idx"),
          r.getAs[java.sql.Timestamp]("ts").toString
        )
      )
      .toSet

  test("steps confirm only once the watermark passes them, in batch-equal order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = startQuery(input, "stream_funnel_basic", "0 seconds")
    try {
      input.addData(
        (1L, "view", t("2025-01-01 10:00:00")),
        (1L, "click", t("2025-01-01 10:01:00")),
        (2L, "click", t("2025-01-01 10:00:00")) // click before any view
      )
      query.processAllAvailable()
      // watermark after batch 1 is 10:01 -> only user 1's 10:00 view
      // is strictly below... (<= wm counts 10:01 too): view+click in
      input.addData((1L, "purchase", t("2025-01-01 10:02:00")))
      query.processAllAvailable()
      input.addData((9L, "view", t("2025-01-01 11:00:00"))) // advance wm
      query.processAllAvailable()
      // the error event is filtered BEFORE the watermark node (it
      // cannot advance anything); user 8's view moves the watermark
      // past 11:00, confirming user 9's held step
      input.addData(
        (8L, "view", t("2025-01-01 12:00:00")),
        (9L, "error", t("2025-01-01 12:30:00"))
      )
      query.processAllAvailable()
      assert(
        rows("stream_funnel_basic") == Set(
          (1L, 1, "2025-01-01 10:00:00.0"),
          (1L, 2, "2025-01-01 10:01:00.0"),
          (1L, 3, "2025-01-01 10:02:00.0"),
          (9L, 1, "2025-01-01 11:00:00.0")
        )
      )
      // user 2 never converts past a click-first sequence
      assert(!rows("stream_funnel_basic").exists(_._1 == 2L))
    } finally query.stop()
  }

  test("an out-of-order view arriving after the click still converts the user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = startQuery(input, "stream_funnel_ooo", "10 minutes")
    try {
      // click arrives FIRST but is timestamped after the view
      input.addData((1L, "click", t("2025-01-01 10:05:00")))
      query.processAllAvailable()
      input.addData((1L, "view", t("2025-01-01 10:00:00"))) // within the 10-min delay
      query.processAllAvailable()
      // advance the watermark far past both events
      input.addData((9L, "view", t("2025-01-01 11:00:00")))
      query.processAllAvailable()
      input.addData((9L, "view", t("2025-01-01 12:00:00")))
      query.processAllAvailable()
      val got = rows("stream_funnel_ooo").filter(_._1 == 1L)
      assert(
        got == Set(
          (1L, 1, "2025-01-01 10:00:00.0"),
          (1L, 2, "2025-01-01 10:05:00.0")
        )
      )
    } finally query.stop()
  }

  test("timer flushes a held step when the user goes silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = startQuery(input, "stream_funnel_timer", "1 minute")
    try {
      input.addData((1L, "view", t("2025-01-01 10:00:00")))
      query.processAllAvailable()
      // user 1 sends nothing more; another user's traffic advances the
      // watermark past 10:00 and the TIMER must fold the held view
      input.addData((9L, "view", t("2025-01-01 10:30:00")))
      query.processAllAvailable()
      input.addData((9L, "view", t("2025-01-01 10:31:00")))
      query.processAllAvailable()
      assert(rows("stream_funnel_timer").contains((1L, 1, "2025-01-01 10:00:00.0")))
    } finally query.stop()
  }

  test("final completions equal the batch funnel walk on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    // 1-day delay: batches interleave users with older timestamps, and
    // nothing here may be dropped as late
    val query = startQuery(input, "stream_funnel_eq", "1 day")
    val data = Seq(
      (1L, "view", t("2025-01-01 10:00:00")),
      (1L, "click", t("2025-01-01 10:01:00")),
      (1L, "purchase", t("2025-01-01 10:02:00")),
      (2L, "click", t("2025-01-01 09:00:00")),
      (2L, "view", t("2025-01-01 09:30:00")),
      (2L, "purchase", t("2025-01-01 09:45:00")),
      (3L, "view", t("2025-01-01 08:00:00")),
      (3L, "click", t("2025-01-01 08:00:00")) // same-instant: strict order blocks
    )
    try {
      // in-order per user across two batches + a watermark-advancing tail
      input.addData(data.take(4): _*)
      query.processAllAvailable()
      input.addData(data.drop(4): _*)
      query.processAllAvailable()
      input.addData((9L, "view", t("2025-01-03 00:00:00")))
      query.processAllAvailable()
      input.addData((9L, "view", t("2025-01-05 00:00:00")))
      query.processAllAvailable()

      val streamed = rows("stream_funnel_eq")
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).max)
        .toMap
      val batch = graft.operators.EventAnalytics
        .funnelSteps(
          data.toDF("user_id", "event_type", "ts"),
          "user_id",
          "event_type",
          "ts",
          Seq("view", "click", "purchase")
        )
        .collect()
        .map(r => r.getInt(0) -> r.getLong(2))
        .toMap
      // batch counts users per step; rebuild that from streamed maxima
      val streamedStepCounts = (1 to 3).map { s =>
        s.toLong -> streamed.count { case (u, r) => u != 9L && r >= s }.toLong
      }.toMap
      assert(streamedStepCounts == Map(1L -> batch(1), 2L -> batch(2), 3L -> batch(3)))
    } finally query.stop()
  }
}
