package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap closes a session mid-stream; watermark closes the trailing session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = StreamingSessionize.sessionsDF(
      input.toDF().toDF("user_id", "ts"),
      gapMillis = 10 * 60 * 1000 // 10 min
    )
    val query = sessions.writeStream
      .format("memory")
      .queryName("stream_sessions")
      .outputMode("append")
      .start()
    try {
      // user 1: two events 5 min apart (one session), then a 30-min gap
      input.addData(
        (1L, t("2025-01-01 10:00:00")),
        (1L, t("2025-01-01 10:05:00")),
        (2L, t("2025-01-01 10:00:00"))
      )
      query.processAllAvailable()
      // nothing closed yet: watermark hasn't passed any last+gap
      assert(spark.table("stream_sessions").count() == 0)

      // the 10:40 event closes user 1's first session by GAP and
      // advances the watermark to 10:40, which passes user 2's
      // 10:00+10min timeout on the following sweep
      input.addData((1L, t("2025-01-01 10:40:00")))
      query.processAllAvailable()
      input.addData((1L, t("2025-01-01 10:41:00"))) // keeps session open; triggers timeout sweep
      query.processAllAvailable()

      val closed = spark
        .table("stream_sessions")
        .collect()
        .map(r =>
          (
            r.getAs[Long]("user_id"),
            r.getAs[java.sql.Timestamp]("session_start").toString,
            r.getAs[java.sql.Timestamp]("session_end").toString,
            r.getAs[Long]("n_events")
          )
        )
        .toSet
      assert(
        closed == Set(
          (1L, "2025-01-01 10:00:00.0", "2025-01-01 10:05:00.0", 2L),
          (2L, "2025-01-01 10:00:00.0", "2025-01-01 10:00:00.0", 1L)
        )
      )
    } finally query.stop()
  }

  test("a within-watermark late event cannot fuse sessions across a gap (delay > gap)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = StreamingSessionize.sessionsDF(
      input.toDF().toDF("user_id", "ts"),
      gapMillis = 10 * 60 * 1000,
      delayThreshold = "2 hours"
    )
    val query = sessions.writeStream
      .format("memory")
      .queryName("stream_sessions_late")
      .outputMode("append")
      .start()
    try {
      input.addData((1L, t("2025-01-01 10:00:00")))
      query.processAllAvailable()
      input.addData((1L, t("2025-01-01 12:00:00")))
      query.processAllAvailable()
      // late but within the 2h watermark delay; 30min after session 1,
      // 90min before session 2 — must become its OWN session, never
      // bridge [10:00] and [12:00]
      input.addData((1L, t("2025-01-01 10:30:00")))
      query.processAllAvailable()
      // advance the watermark far enough to seal everything
      input.addData((99L, t("2025-01-01 15:00:00")))
      query.processAllAvailable()
      input.addData((99L, t("2025-01-01 15:01:00")))
      query.processAllAvailable()

      val got = spark
        .table("stream_sessions_late")
        .where($"user_id" === 1L)
        .collect()
        .map(r => (r.get(1).toString, r.get(2).toString, r.getAs[Long]("n_events")))
        .toSet
      assert(
        got == Set(
          ("2025-01-01 10:00:00.0", "2025-01-01 10:00:00.0", 1L),
          ("2025-01-01 10:30:00.0", "2025-01-01 10:30:00.0", 1L),
          ("2025-01-01 12:00:00.0", "2025-01-01 12:00:00.0", 1L)
        )
      )
    } finally query.stop()
  }

  test("streaming session boundaries equal the batch gap-sessionization on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (7L, t("2025-02-01 09:00:00")),
      (7L, t("2025-02-01 09:04:00")),
      (7L, t("2025-02-01 09:30:00")),
      (7L, t("2025-02-01 09:31:00")),
      (8L, t("2025-02-01 09:00:00"))
    )
    // batch truth: sessions via lag-gap cumulative count
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("ts")
    val batch = events
      .toDF("user_id", "ts")
      .withColumn(
        "new_s",
        when(
          col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long") > 600,
          1
        ).otherwise(0)
      )
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy("user_id", "sid")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events")
      )
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3)))
      .toSet

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = StreamingSessionize.sessionsDF(
      input.toDF().toDF("user_id", "ts"),
      gapMillis = 600 * 1000
    )
    val query = sessions.writeStream
      .format("memory")
      .queryName("stream_sessions_b")
      .outputMode("append")
      .start()
    try {
      // batch 1 advances the watermark to 09:30 — user 8's 09:00 event
      // must ride the SAME batch (the engine drops sub-watermark
      // arrivals before they reach the state function)
      input.addData(events.take(3) :+ events(4): _*)
      query.processAllAvailable()
      input.addData(events(3))
      query.processAllAvailable()
      // push the watermark far past every open timeout
      input.addData((99L, t("2025-02-02 00:00:00")))
      query.processAllAvailable()
      input.addData((99L, t("2025-02-03 00:00:00")))
      query.processAllAvailable()

      val streamed = spark
        .table("stream_sessions_b")
        .where(col("user_id") < 99L)
        .collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3)))
        .toSet
      assert(streamed == batch)
    } finally query.stop()
  }
}
