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
