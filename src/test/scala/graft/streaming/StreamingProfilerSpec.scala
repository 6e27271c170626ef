package graft.streaming

import graft.SparkSpec
import graft.core.Granularity
import graft.profiler.ProfilingBuilder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("streaming profile emits the same long-format metrics as batch once windows close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("ts", "value")

    val profiled = StreamingProfiler.profile(
      stream,
      "ts",
      ProfilingBuilder.simple,
      Granularity.Hour,
      watermark = "0 seconds"
    )
    val query = profiled.writeStream
      .format("memory")
      .queryName("stream_profile")
      .outputMode("append")
      .start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2025-01-01 10:05:00"), 1.0),
        (java.sql.Timestamp.valueOf("2025-01-01 10:25:00"), 3.0)
      )
      query.processAllAvailable()
      // watermark must pass hour 10 before its window emits
      input.addData((java.sql.Timestamp.valueOf("2025-01-01 12:00:00"), 100.0))
      query.processAllAvailable()
      input.addData((java.sql.Timestamp.valueOf("2025-01-01 13:00:00"), 100.0))
      query.processAllAvailable()

      val out = spark.table("stream_profile")
      val hour10 = out.where($"ts" === to_timestamp(lit("2025-01-01 10:00:00")))
      val mean = hour10.where($"name" === "Mean" && $"instance" === "value")
        .select("value").as[Double].collect()
      val size = hour10.where($"name" === "Size")
        .select("value").as[Double].collect()
      assert(mean.toSeq == Seq(2.0))
      assert(size.toSeq == Seq(2.0))
    } finally query.stop()
  }

  test("exact analyzers are rejected in append mode (unbounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("ts", "s")
    // CountDistinct (exact) is not partial-aggregatable in append mode —
    // the profiler's sketch builder is the streaming-safe configuration.
    val profiled = StreamingProfiler.profile(
      stream,
      "ts",
      ProfilingBuilder.default, // contains exact CountDistinct
      Granularity.Hour,
      watermark = "0 seconds"
    )
    intercept[Exception] {
      val q = profiled.writeStream.format("memory").queryName("bad_stream").outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
  }
}
