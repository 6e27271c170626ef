package graft.profiler

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("2024-01-01 01:00:00", 1.0, 10.0),
    ("2024-01-01 02:00:00", 2.0, 20.0),
    ("2024-01-02 01:00:00", 3.0, 30.0),
    ("2024-01-08 01:00:00", 4.0, 40.0),
    ("2024-01-09 01:00:00", 100.0, -5.0),
    ("2024-02-01 01:00:00", 7.0, 70.0)
  ).toDF("raw_ts", "a", "b")
    .select(to_timestamp($"raw_ts").as("ts"), $"a", $"b")

  test("reaggregated daily partials are bit-identical to direct coarse partials") {
    val daily = Moments.partials(sample, "ts", Seq("a", "b"), "day")
    for (coarse <- Seq("week", "month")) {
      val merged = Moments.reaggregate(daily, coarse)
        .orderBy("ts", "instance").collect()
      val direct = Moments.partials(sample, "ts", Seq("a", "b"), coarse)
        .orderBy("ts", "instance").collect()
      assert(merged.toSeq == direct.toSeq, s"grain=$coarse")
    }
  }

  test("finalizeProfile computes mean/stddev matching Spark's avg/stddev_samp") {
    val got = Moments
      .finalizeProfile(Moments.partials(sample, "ts", Seq("a"), "month"))
      .orderBy("ts")
      .select("n", "mean", "stddev", "min", "max")
      .collect()
    val want = sample
      .groupBy(date_trunc("month", $"ts").as("ts"))
      .agg(
        count("a").as("n"),
        graft.functions.round6(avg("a")).as("mean"),
        graft.functions.round6(stddev_samp("a")).as("stddev"),
        min("a").as("min"),
        max("a").as("max")
      )
      .orderBy("ts")
      .select("n", "mean", "stddev", "min", "max")
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("single-point bucket yields NULL stddev, not zero or NaN") {
    val one = Seq(("2024-01-01 01:00:00", 5.0)).toDF("raw_ts", "a")
      .select(to_timestamp($"raw_ts").as("ts"), $"a")
    val row = Moments.finalizeProfile(Moments.partials(one, "ts", Seq("a"))).collect().head
    assert(row.getAs[Long]("n") == 1L)
    assert(row.isNullAt(row.fieldIndex("stddev")))
    assert(row.getAs[Double]("mean") == 5.0)
  }

  test("null values are excluded from n and the moment sums") {
    val withNulls = Seq(
      ("2024-01-01 01:00:00", Some(1.0)),
      ("2024-01-01 02:00:00", None),
      ("2024-01-01 03:00:00", Some(3.0))
    ).toDF("raw_ts", "a")
      .select(to_timestamp($"raw_ts").as("ts"), $"a")
    val row = Moments.finalizeProfile(Moments.partials(withNulls, "ts", Seq("a"))).collect().head
    assert(row.getAs[Long]("n") == 2L)
    assert(row.getAs[Double]("mean") == 2.0)
  }
}
