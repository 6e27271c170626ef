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
      "e"
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
}
