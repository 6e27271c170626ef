package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val values = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 99.0)).toDF("id", "v")
  private val ranges = Seq(
    ("a", 0.0, 10.0),   // matches v=5
    ("b", 10.0, 20.0),  // matches v=15
    ("c", 4.0, 26.0),   // wide: matches 5, 15, 25 (overlapping ranges allowed)
    ("d", 50.0, 60.0)   // matches nothing
  ).toDF("r", "lo", "hi")

  test("interval join equals the naive non-equi join on overlapping ranges") {
    val bucketed = RangeJoin
      .intervalJoin(values, ranges, "v", "lo", "hi", bucketWidth = 7.0)
      .select("id", "r")
      .as[(Long, String)]
      .collect()
      .toSet
    val naive = values
      .join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "r")
      .as[(Long, String)]
      .collect()
      .toSet
    assert(bucketed == naive)
    assert(bucketed == Set((1L, "a"), (1L, "c"), (2L, "b"), (2L, "c"), (3L, "c")))
  }

  test("boundary values are inclusive on both ends") {
    val vals = Seq((1L, 10.0)).toDF("id", "v")
    val rs = Seq(("lo-edge", 10.0, 20.0), ("hi-edge", 0.0, 10.0)).toDF("r", "lo", "hi")
    val got = RangeJoin
      .intervalJoin(vals, rs, "v", "lo", "hi", 3.0)
      .select("r")
      .as[String]
      .collect()
      .toSet
    assert(got == Set("lo-edge", "hi-edge"))
  }

  test("inverted intervals (lo > hi) are dropped before the explode and match nothing") {
    val rs = Seq(("ok", 0.0, 10.0), ("inverted", 30.0, 3.0)).toDF("r", "lo", "hi")
    val got = RangeJoin
      .intervalJoin(values, rs, "v", "lo", "hi", 7.0)
      .select("id", "r")
      .as[(Long, String)]
      .collect()
      .toSet
    assert(got == Set((1L, "ok")))
  }

  test("a user '_bucket' column is rejected instead of silently destroyed") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(
        values.withColumn("_bucket", lit(1)),
        Seq(("r", 0.0, 1.0)).toDF("r", "lo", "hi"),
        "v", "lo", "hi", 1.0)
    }
    assert(ex.getMessage.contains("_bucket"))
  }

  test("an interval spanning more buckets than the ceiling raises instead of exploding") {
    val rs = Seq(("huge", 0.0, 1e9)).toDF("r", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(values, rs, "v", "lo", "hi", 1.0, maxBucketsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("RangeJoin")), ex.toString)
    // the same data passes with a bucket width sized to the intervals
    val ok = RangeJoin.intervalJoin(values, rs, "v", "lo", "hi", 1e7).select("id").collect()
    assert(ok.length == 4)
  }

  test("plans as an equi-join, not a broadcast nested loop") {
    val plan = RangeJoin
      .intervalJoin(values, ranges, "v", "lo", "hi", 7.0)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val naive = values
      .join(ranges, col("v") >= col("lo") && col("v") <= col("hi"))
      .queryExecution
      .executedPlan
      .toString
    // the shape this operator exists to avoid
    assert(naive.contains("BroadcastNestedLoopJoin"))
  }
}
