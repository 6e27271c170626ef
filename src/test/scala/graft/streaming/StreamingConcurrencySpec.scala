package graft.streaming

import graft.SparkSpec
import graft.operators.EventAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private val intervals = Seq(
    ("A", t("2025-01-01 10:00:30"), t("2025-01-01 10:05:10")),
    ("B", t("2025-01-01 10:02:00"), t("2025-01-01 10:02:40")),
    ("C", t("2025-01-01 10:05:00"), t("2025-01-01 10:07:00"))
  )

  test("streamed buckets equal the batch sweep-line; epilogue rebuilds concurrency") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp)]
    val out = StreamingConcurrency.deltas(
      input.toDF().toDF("id", "s", "e"),
      "s",
      "e",
      maxIntervalDuration = "10 minutes"
    )
    val query = out.writeStream
      .format("memory").queryName("stream_conc").outputMode("append").start()
    try {
      input.addData(intervals.take(2): _*)
      query.processAllAvailable()
      input.addData(intervals.drop(2): _*)
      query.processAllAvailable()
      // close every window: an interval far in the future moves the watermark
      input.addData(("wm", t("2025-01-02 00:00:00"), t("2025-01-02 00:00:01")))
      query.processAllAvailable()
      val streamed = spark
        .table("stream_conc")
        .where($"t" < t("2025-01-01 12:00:00"))
      val batch = EventAnalytics
        .concurrencyProfile(
          intervals.toDF("id", "s", "e"), "s", "e", grain = "minute")
      val got = StreamingConcurrency
        .concurrencyFromDeltas(streamed)
        .orderBy("t")
        .as[(java.sql.Timestamp, Long, Long, Long, Long)]
        .collect()
        .toSeq
      val want = batch
        .orderBy("t")
        .as[(java.sql.Timestamp, Long, Long, Long, Long)]
        .collect()
        .toSeq
      assert(got == want, s"streamed $got != batch $want")
      assert(got.map(_._5).max == 1L)
    } finally query.stop()
  }

  test("a long interval arriving after end events advanced the watermark keeps its start row") {
    // END events ride the same watermark column as START events, but a
    // completed interval's start lags its end by the interval length —
    // without the maxIntervalDuration cushion, batch 1's end (11:00)
    // would advance the watermark past batch 2's start (10:10) and the
    // +1 row would be silently dropped, leaving ends without starts.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, java.sql.Timestamp)]
    val out = StreamingConcurrency.deltas(
      input.toDF().toDF("id", "s", "e"), "s", "e",
      maxIntervalDuration = "1 hour")
    val query = out.writeStream
      .format("memory").queryName("stream_conc_late").outputMode("append").start()
    try {
      input.addData(("A", t("2025-01-01 10:59:00"), t("2025-01-01 11:00:00")))
      query.processAllAvailable()
      input.addData(("B", t("2025-01-01 10:10:00"), t("2025-01-01 11:00:30")))
      query.processAllAvailable()
      input.addData(("wm", t("2025-01-01 23:00:00"), t("2025-01-01 23:00:01")))
      query.processAllAvailable()
      val rows = spark.table("stream_conc_late")
        .where($"t" < t("2025-01-01 22:00:00"))
        .agg(sum($"starts"), sum($"ends"), sum($"net_change"))
        .collect().head
      assert(rows.getLong(0) == 2L, s"both starts must survive, got $rows")
      assert(rows.getLong(1) == 2L && rows.getLong(2) == 0L)
    } finally query.stop()
  }
}
