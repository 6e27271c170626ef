package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinStatsSpec extends SparkSpec {
  import spark.implicits._

  test("per-key products and shares match the hand-computed join size") {
    val left = Seq(1, 1, 1, 2, 3).map(k => (k, "l")).toDF("lk", "p")
    val right = Seq(1, 1, 2, 2, 2, 9).map(k => (k, "r")).toDF("rk", "p")
    // key 1: 3*2=6, key 2: 1*3=3, key 3/9: unmatched -> total 9
    val got = JoinStats
      .joinCardinality(left, right, "lk", "rk", topK = 10)
      .as[(Int, Long, Long, Long, Double)]
      .collect()
      .toSeq
    assert(got == Seq((1, 3L, 2L, 6L, 0.666667), (2, 1L, 3L, 3L, 0.333333)))
  }

  test("topK cut is deterministic: out_rows ties break on the key") {
    val df = Seq(5, 5, 3, 3, 1, 1, 2).map(k => (k, "x")).toDF("k", "p")
    // self-join: keys 5,3,1 all 2*2=4; key 2 is 1. topK=2 must keep 1,3
    val got = JoinStats
      .joinCardinality(df, df, "k", "k", topK = 2)
      .as[(Int, Long, Long, Long, Double)]
      .collect()
      .map(_._1)
      .toSeq
    assert(got == Seq(1, 3))
  }

  test("unmatched-only inputs produce an empty report, not a crash") {
    val l = Seq((1, "a")).toDF("lk", "p")
    val r = Seq((2, "b")).toDF("rk", "p")
    assert(JoinStats.joinCardinality(l, r, "lk", "rk").count() == 0)
  }
}
