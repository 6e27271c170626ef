package graft.streaming

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streaming centroid partials + batch epilogue reproduce centroidShift") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Array[Float])]
    val stream = input.toDF().toDF("ts", "label", "embedding")

    val partials = StreamingDrift.centroidPartials(
      stream, "embedding", "label", "ts",
      windowDuration = "1 hour", watermark = "0 seconds")
    val query = partials.writeStream
      .format("memory")
      .queryName("drift_partials")
      .outputMode("append")
      .start()
    try {
      // hour 10: group g drifts to centroid (2,3); "vanishing" absent
      input.addData(
        (java.sql.Timestamp.valueOf("2025-01-01 10:05:00"), "g", Array(2.0f, 4.0f)),
        (java.sql.Timestamp.valueOf("2025-01-01 10:25:00"), "g", Array(2.0f, 2.0f))
      )
      query.processAllAvailable()
      input.addData((java.sql.Timestamp.valueOf("2025-01-01 12:00:00"), "g", Array(0f, 0f)))
      query.processAllAvailable()

      val emitted = spark
        .table("drift_partials")
        .where($"ts" === to_timestamp(lit("2025-01-01 10:00:00")))
      assert(emitted.count() === 2) // dims 0 and 1 of group g

      // reference snapshot: g at (2,0), vanishing at (9,9)
      val ref = Similarity.centroids(
        Seq(
          (1L, Array(1.0f, 0.0f), "g"),
          (2L, Array(3.0f, 0.0f), "g"),
          (3L, Array(9.0f, 9.0f), "vanishing")
        ).toDF("vec_id", "embedding", "label"),
        "embedding",
        "label"
      )
      val shifts = StreamingDrift.shiftAgainst(emitted, ref).collect()
      val byKey = shifts.map(r => r.getAs[String]("key") -> r).toMap
      assert(byKey.keySet === Set("g", "vanishing"))
      // (2,0) -> (2,3): shift exactly 3
      assert(byKey("g").getAs[Double]("shift") === 3.0)
      assert(byKey("vanishing").isNullAt(byKey("vanishing").fieldIndex("shift")))
      assert(byKey("vanishing").isNullAt(byKey("vanishing").fieldIndex("n_b")))
    } finally query.stop()
  }
}
