package graft.streaming

import graft.SparkSpec
import graft.ml.Logit
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The fitted quality classifier at STREAM time: [[Logit.scored]] is a
  * pure scan-side expression (the trained weights are literals in the
  * plan), so the same model that filtered the batch corpus scores an
  * ingest stream with no state, no aggregation, and exactly the batch
  * scores — train offline, gate online.
  */
class StreamingClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("a fitted model scores a stream scan-side, bit-equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    // train on a batch seed set
    val seed = (0 until 40)
      .map(i => (i.toLong, if (i % 2 == 0) 1.0 else 0.0,
        if (i % 2 == 0) 0.8 + 0.001 * i else 0.2 - 0.001 * i))
      .toDF("id", "y", "x")
    val model = Logit.fit(seed, "y", Seq("x"), iters = 10, lr = 4.0)

    val input = MemoryStream[(Long, Double)]
    val scored = Logit.scored(input.toDF().toDF("id", "x"), model, Seq("x"))
    assert(scored.isStreaming, "scoring must not break the streaming plan")
    val query = scored.writeStream
      .format("memory")
      .queryName("stream_cls")
      .outputMode("append")
      .start()
    try {
      input.addData((100L, 0.85), (101L, 0.15))
      query.processAllAvailable()
      input.addData((102L, 0.5)) // a second batch scores identically
      query.processAllAvailable()
      val got = spark
        .table("stream_cls")
        .orderBy("id")
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("pred")))
      val batch = Logit
        .scored(
          Seq((100L, 0.85), (101L, 0.15), (102L, 0.5)).toDF("id", "x"),
          model,
          Seq("x")
        )
        .orderBy("id")
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"), r.getAs[Int]("pred")))
      assert(got.toSeq == batch.toSeq)
      assert(got(0)._3 == 1 && got(1)._3 == 0) // the model separates
    } finally query.stop()
  }
}
