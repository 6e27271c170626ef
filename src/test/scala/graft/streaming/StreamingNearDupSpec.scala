package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming MinHash near-dup: first arrival of a content family
  * passes, later variants are flagged with a high estimated Jaccard,
  * distinct content stays unflagged — across AND within micro-batches
  * — and a bucket root expires with event time.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private val prose =
    "the quick brown fox jumped over the lazy dog while the rain fell on the quiet town all day"
  private val proseVariant = prose.replace("rain", "snow") // one-word mutation
  private val unrelated =
    "integer overflow semantics differ between checked arithmetic and wrapping arithmetic in systems code"

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try body
    finally prior.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("first arrival passes, variants are flagged across and within batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val out = StreamingNearDup.nearDup(
        input.toDF().toDF("doc_id", "ts", "text"),
        "text", "doc_id", "ts",
        watermark = "10 minutes",
        horizon = java.time.Duration.ofHours(1)
      )
      val query = out.writeStream
        .format("memory").queryName("stream_neardup").outputMode("append").start()
      try {
        input.addData(
          (1L, t("2025-01-01 10:00:00"), prose),
          (2L, t("2025-01-01 10:01:00"), prose), // in-batch exact dup
          (3L, t("2025-01-01 10:02:00"), unrelated)
        )
        query.processAllAvailable()
        // cross-batch one-word variant
        input.addData((4L, t("2025-01-01 10:20:00"), proseVariant))
        query.processAllAvailable()
        val rows = spark.table("stream_neardup")
          .as[StreamingNearDup.Verdict].collect().sortBy(_.doc_id)
        assert(rows.map(_.doc_id).toSeq === Seq(1L, 2L, 3L, 4L))
        val byId = rows.map(r => r.doc_id -> r).toMap
        assert(!byId(1L).near_dup, "family root must pass")
        assert(byId(2L).near_dup && byId(2L).max_est === 1.0, "exact dup flags at est 1.0")
        assert(!byId(3L).near_dup, "unrelated content must pass")
        assert(byId(4L).near_dup, s"one-word variant must flag (est ${byId(4L).max_est})")
        assert(byId(4L).max_est < 1.0, "variant is near, not exact")
      } finally query.stop()
    }
  }

  test("a bucket root expires with event time; the family re-roots afterward") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val out = StreamingNearDup.nearDup(
        input.toDF().toDF("doc_id", "ts", "text"),
        "text", "doc_id", "ts",
        watermark = "1 minute",
        horizon = java.time.Duration.ofMinutes(30)
      )
      val query = out.writeStream
        .format("memory").queryName("stream_neardup_ttl").outputMode("append").start()
      try {
        input.addData((1L, t("2025-01-01 10:00:00"), prose))
        query.processAllAvailable()
        // push the watermark far past root-ts + horizon so the
        // event-time timer fires and clears the bucket state
        input.addData((2L, t("2025-01-01 12:00:00"), unrelated))
        query.processAllAvailable()
        input.addData((3L, t("2025-01-01 12:01:00"), prose))
        query.processAllAvailable()
        val byId = spark.table("stream_neardup_ttl")
          .as[StreamingNearDup.Verdict].collect().map(r => r.doc_id -> r).toMap
        assert(!byId(1L).near_dup)
        assert(!byId(3L).near_dup,
          s"root expired — the re-sent family must re-root, got est ${byId(3L).max_est}")
      } finally query.stop()
    }
  }

  test("docs too short to shingle emit nothing (documented contract)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val out = StreamingNearDup.nearDup(
        input.toDF().toDF("doc_id", "ts", "text"),
        "text", "doc_id", "ts",
        watermark = "10 minutes",
        horizon = java.time.Duration.ofHours(1)
      )
      val query = out.writeStream
        .format("memory").queryName("stream_neardup_short").outputMode("append").start()
      try {
        input.addData(
          (1L, t("2025-01-01 10:00:00"), "too short"),
          (2L, t("2025-01-01 10:01:00"), prose)
        )
        query.processAllAvailable()
        val ids = spark.table("stream_neardup_short")
          .select("doc_id").as[Long].collect().sorted
        assert(ids.toSeq === Seq(2L))
      } finally query.stop()
    }
  }
}
