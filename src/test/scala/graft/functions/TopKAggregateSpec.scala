package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(
      df: org.apache.spark.sql.DataFrame,
      k: Int
  ): Set[(String, Long, Double, Int)] = {
    val w = Window.partitionBy("g").orderBy(col("m").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "id", "m", "rank")
      .as[(String, Long, Double, Int)]
      .collect()
      .toSet
  }

  private def aggTopK(
      df: org.apache.spark.sql.DataFrame,
      k: Int
  ): Set[(String, Long, Double, Int)] =
    df.groupBy("g")
      .agg(topkAggregate.topKBy(col("m"), col("id"), k).as("_top"))
      .select(col("g"), posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(col("g"), col("_e.id"), col("_e.metric"), (col("_pos") + 1).as("rank"))
      .as[(String, Long, Double, Int)]
      .collect()
      .toSet

  test("matches the window-rank formulation on random skewed data") {
    val rnd = new scala.util.Random(7)
    // skewed group sizes incl. groups smaller than k; duplicate metric
    // values force tie-breaking through the id
    val rows = (0 until 5000).map { i =>
      val g = s"g${rnd.nextInt(7)}"
      (g, i.toLong, math.floor(rnd.nextDouble() * 50) / 10.0)
    } ++ Seq(("tiny", 999999L, 1.0))
    val df = rows.toDF("g", "id", "m").repartition(13)
    for (k <- Seq(1, 3, 10))
      assert(aggTopK(df, k) == windowTopK(df, k), s"mismatch at k=$k")
  }

  test("null metrics and ids are skipped; all-null group yields empty array") {
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 5.0),
      ("a", 2L, null),
      ("a", null, 9.0),
      ("b", 3L, null)
    ).toDF("g", "id", "m")
    val out = df
      .groupBy("g")
      .agg(topkAggregate.topKBy(col("m"), col("id"), 2).as("t"))
      .select(col("g"), size(col("t")).as("n"))
      .as[(String, Int)]
      .collect()
      .toMap
    assert(out == Map("a" -> 1, "b" -> 0))
  }

  test("exact boundary ties: equal metrics keep the smallest ids") {
    val df = (1L to 10L).map(i => ("g", i, 1.0)).toDF("g", "id", "m")
    val got = aggTopK(df, 3).toSeq.sortBy(_._4)
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
  }

  test("partial aggregation: plan is an object-hash aggregate, no Window/Sort-all") {
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toDouble)).toDF("g", "id", "m")
    val plan = df
      .groupBy("g")
      .agg(topkAggregate.topKBy(col("m"), col("id"), 3).as("t"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object-hash aggregate:\n$plan")
    assert(plan.contains("partial_topk_by"), s"expected a PARTIAL phase before the exchange:\n$plan")
    assert(!plan.contains("Window"), "must not fall back to a window")
  }

  test("works under Structured Streaming: per-group top-k across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val agg = input
      .toDF()
      .toDF("g", "id", "m")
      .groupBy("g")
      .agg(topkAggregate.topKBy(col("m"), col("id"), 2).as("t"))
    val query = agg.writeStream
      .format("memory")
      .queryName("stream_topk")
      .outputMode("complete")
      .start()
    try {
      input.addData(("a", 1L, 1.0), ("a", 2L, 5.0))
      query.processAllAvailable()
      // a later batch introduces a stronger entry: state must merge,
      // evicting the weakest of the kept pair
      input.addData(("a", 3L, 9.0), ("b", 4L, 2.0))
      query.processAllAvailable()
      val out = spark
        .table("stream_topk")
        .select(col("g"), col("t"))
        .collect()
        .map(r =>
          r.getString(0) ->
            r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1)))
        )
        .toMap
      assert(out("a") == Seq((9.0, 3L), (5.0, 2L)))
      assert(out("b") == Seq((2.0, 4L)))
    } finally query.stop()
  }

  test("buffer round-trips through serialization") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 2L), (3.0, 7L), (4.0, 1L), (5.0, 1L)).foreach { case (m, i) =>
      b.add(m, i)
    }
    val back = TopKBuffer.fromBytes(3, b.serialized())
    assert(back.sortedDesc().toSeq == Seq((5.0, 1L), (5.0, 2L), (4.0, 1L)))
  }
}
