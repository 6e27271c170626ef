package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private val goodText: String =
    Iterator
      .continually(Seq("the", "quick", "brown", "fox", "and", "the", "lazy",
        "dog", "walked", "over", "a", "hill"))
      .flatten
      .take(60)
      .mkString(" ")

  test("streaming funnel tags rule losses and suppresses within-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingFunnel.prepare(
      input.toDF().toDF("doc_id", "ts", "text"),
      "text",
      "ts",
      watermark = "1 hour"
    )
    val query = out.writeStream
      .format("memory")
      .queryName("stream_funnel")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (1L, t("2025-01-01 10:00:00"), goodText),
        (2L, t("2025-01-01 10:01:00"), "short doc"), // rule loss: tagged, emitted
        (3L, t("2025-01-01 10:02:00"), goodText + " ...") // normalized dup: suppressed
      )
      query.processAllAvailable()
      // cross-batch duplicate inside the watermark: also suppressed
      input.addData((4L, t("2025-01-01 10:30:00"), goodText))
      query.processAllAvailable()
      val rows = spark
        .table("stream_funnel")
        .select("doc_id", "drop_reason", "kept")
        .as[(Long, String, Boolean)]
        .collect()
        .sortBy(_._1)
      assert(rows.map(_._1).toSeq === Seq(1L, 2L))
      assert(rows(0)._2 === "kept" && rows(0)._3)
      assert(rows(1)._2 === "too_short" && !rows(1)._3)
    } finally query.stop()
  }

  test("a rule-failed copy never claims the fingerprint slot in the state store") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    // noisy = same normalized fingerprint as goodText but fails
    // symbol_ratio — it must NOT poison the dedup state, so the clean
    // doc arriving later is still admitted
    val noisy = goodText.split(" ").map(w => w + "!!!").mkString(" ")
    val out = StreamingFunnel.prepare(
      input.toDF().toDF("doc_id", "ts", "text"),
      "text",
      "ts",
      watermark = "1 hour"
    )
    val query = out.writeStream
      .format("memory")
      .queryName("stream_funnel2")
      .outputMode("append")
      .start()
    try {
      input.addData((1L, t("2025-01-01 10:00:00"), noisy))
      query.processAllAvailable()
      input.addData((2L, t("2025-01-01 10:05:00"), goodText))
      query.processAllAvailable()
      val rows = spark
        .table("stream_funnel2")
        .select("doc_id", "drop_reason")
        .as[(Long, String)]
        .collect()
        .sortBy(_._1)
      assert(rows.toSeq === Seq((1L, "symbol_ratio"), (2L, "kept")))
    } finally query.stop()
  }
}
