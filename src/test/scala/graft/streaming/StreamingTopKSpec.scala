package graft.streaming

import graft.SparkSpec
import graft.profiler.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowed MG counters equal the batch sketch per closed window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("ts", "key")
    val query = StreamingTopK
      .windowedHeavyHitters(stream, "ts", "key", k = 10,
        windowDuration = "1 hour", watermark = "0 seconds")
      .writeStream
      .format("memory")
      .queryName("topk_counters")
      .outputMode("append")
      .start()
    try {
      val hour10 = Seq("a", "a", "a", "b", "b", "c")
      input.addData(hour10.map(k => (ts("2025-01-01 10:15:00"), k)): _*)
      query.processAllAvailable()
      // advance the watermark past hour 10 so its window emits
      input.addData((ts("2025-01-01 12:00:00"), "z"))
      query.processAllAvailable()

      val emitted = spark
        .table("topk_counters")
        .where($"window_start" === ts("2025-01-01 10:00:00"))
        .select("counters")
        .as[Map[String, Long]]
        .collect()
      assert(emitted.length == 1)
      // distinct keys < k: the exact regime — identical to batch counts
      val batch = hour10
        .toDF("key")
        .agg(HeavyHitters.sketch(10)($"key"))
        .as[Map[String, Long]]
        .head()
      assert(emitted.head === batch)
      assert(emitted.head === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    } finally query.stop()
  }

  test("ranked epilogue orders by count with deterministic tie-break") {
    val counters = Seq(
      (ts("2025-01-01 10:00:00"), Map("b" -> 5L, "a" -> 5L, "c" -> 1L)),
      (ts("2025-01-01 11:00:00"), Map("x" -> 2L))
    ).toDF("window_start", "counters")
    val got = StreamingTopK
      .ranked(counters, k = 2)
      .orderBy("window_start", "rank")
      .select("key", "est_count", "rank")
      .as[(String, Long, Int)]
      .collect()
      .toSeq
    assert(got === Seq(("a", 5L, 1), ("b", 5L, 2), ("x", 2L, 1)))
  }
}
