package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming exact dedup drops duplicates across micro-batches within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingDedup.exact(
      input.toDF().toDF("doc_id", "ts", "text"),
      "text",
      "ts",
      watermark = "1 hour"
    )
    val query = out.writeStream
      .format("memory")
      .queryName("stream_dedup")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (1L, t("2025-01-01 10:00:00"), "alpha doc"),
        (2L, t("2025-01-01 10:01:00"), "alpha doc"), // in-batch dup
        (3L, t("2025-01-01 10:02:00"), "beta doc")
      )
      query.processAllAvailable()
      // cross-batch dup of "alpha doc" inside the watermark horizon
      input.addData((4L, t("2025-01-01 10:30:00"), "alpha doc"))
      query.processAllAvailable()
      val ids = spark.table("stream_dedup").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L))
    } finally query.stop()
  }

  test("normalized streaming dedup collapses case/punctuation variants") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingDedup.exactNormalized(
      input.toDF().toDF("doc_id", "ts", "text"),
      "text",
      "ts",
      watermark = "1 hour"
    )
    val query = out.writeStream
      .format("memory")
      .queryName("stream_dedup_norm")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (1L, t("2025-01-01 10:00:00"), "Hello, World"),
        (2L, t("2025-01-01 10:01:00"), "hello world!")
      )
      query.processAllAvailable()
      val ids = spark.table("stream_dedup_norm").select("doc_id").as[Long].collect()
      assert(ids.toSeq == Seq(1L))
    } finally query.stop()
  }
}
