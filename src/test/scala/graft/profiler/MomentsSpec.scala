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

  test("quantile partials re-aggregate within rank-error bounds of an exact recompute") {
    // 90 days, values drift upward with per-day spread — weekly/monthly
    // quantiles from merged daily grids must sit close IN RANK to the
    // exact percentiles over the raw rows
    val df = spark.range(90L * 200)
      .select(
        (to_timestamp(lit("2024-01-01 00:00:00")) + make_dt_interval(col("id") / 200))
          .as("ts"),
        (col("id") / 200 * 1.5 + (col("id") % 200) * 0.1 +
          sin(col("id").cast("double")) * 3.0).as("value")
      )
    val daily = Moments.quantilePartials(df, "ts", Seq("value"), "day")
    // partial size is O(grid): 129 points per (day, column)
    assert(daily.select(max(size(col("qgrid")))).head().getInt(0) == 129)
    for (coarse <- Seq("week", "month")) {
      val est = Moments.reaggregateQuantiles(daily, coarse)
        .collect()
        .map(r => (r.getTimestamp(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      assert(est.nonEmpty)
      val raw = df
        .groupBy(date_trunc(coarse, col("ts")).as("ts"))
        .agg(
          count(lit(1)).as("n"),
          collect_list(col("value")).as("vs")
        )
        .collect()
        .map(r => r.getTimestamp(0) -> r.getSeq[Double](2).sorted)
        .toMap
      est.foreach { case (ts, q25, q50, q75) =>
        val vs = raw(ts)
        def rankOf(x: Double) = vs.count(_ <= x).toDouble / vs.size
        // grid discretization (1/128 per day) + approx_percentile error
        assert(math.abs(rankOf(q25) - 0.25) <= 0.03, s"$coarse $ts q25 rank ${rankOf(q25)}")
        assert(math.abs(rankOf(q50) - 0.50) <= 0.03, s"$coarse $ts q50 rank ${rankOf(q50)}")
        assert(math.abs(rankOf(q75) - 0.75) <= 0.03, s"$coarse $ts q75 rank ${rankOf(q75)}")
      }
    }
  }

  test("quantile partials survive a parquet repository round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("qpartials").toString
    val daily = Moments.quantilePartials(sample, "ts", Seq("a", "b"), "day")
    daily.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val est = Moments.reaggregateQuantiles(back, "month")
      .orderBy("ts", "instance")
      .collect()
    val direct = Moments.reaggregateQuantiles(daily, "month")
      .orderBy("ts", "instance")
      .collect()
    assert(est.toSeq == direct.toSeq)
  }

  test("empty buckets (all-null values) merge as zero mass, not poison") {
    val withNulls = Seq(
      ("2024-01-01 01:00:00", Some(1.0)),
      ("2024-01-02 01:00:00", None),
      ("2024-01-03 01:00:00", Some(3.0))
    ).toDF("raw_ts", "v")
      .select(to_timestamp($"raw_ts").as("ts"), $"v".as("a"))
    val daily = Moments.quantilePartials(withNulls, "ts", Seq("a"), "day")
    assert(daily.where(col("qgrid").isNull).count() == 1)
    val merged = Moments.reaggregateQuantiles(daily, "month").collect()
    assert(merged.length == 1)
    assert(merged.head.getDouble(3) == 2.0 || merged.head.getDouble(3) == 1.0) // q50 from {1,3}
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

  test("sub-1e-6 magnitudes keep their mean (per-row quantization must not zero them)") {
    // a DECIMAL(38,6) per-row cast rounds 4e-7 to 0.000000 before
    // summing — mean 0 with no error; scale 12 keeps the value
    val tiny = (1 to 50).map(i => (f"2024-01-01 01:$i%02d:00", 4e-7))
      .toDF("raw_ts", "a")
      .select(to_timestamp($"raw_ts").as("ts"), $"a")
    // the finalized mean is round6'd by the output contract, so the
    // faithful quantity is the STORED partial sum: 50 x 4e-7 = 2e-5
    val part = Moments.partials(tiny, "ts", Seq("a")).collect().head
    val sum = part.getDecimal(part.fieldIndex("sum")).doubleValue()
    assert(math.abs(sum - 2e-5) < 1e-12,
      s"tiny-magnitude partial sum destroyed: $sum")
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

  test("distinct partials union to grain estimates matching exact weekly distincts") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val daily = Moments.distinctPartials(events, "ts", Seq("user_id", "event_type"), "day")
    val weekly = Moments
      .reaggregateDistinct(daily, "week")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(3))
      .toMap
    val exact = events
      .select(date_trunc("week", col("ts")).as("ts"), col("user_id").cast("string").as("user_id"), col("event_type"))
      .unpivot(Array(col("ts")), Array(col("user_id"), col("event_type")), "instance", "_v")
      .groupBy("ts", "instance")
      .agg(count_distinct(col("_v")).as("d"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(weekly.keySet == exact.keySet && weekly.nonEmpty)
    weekly.foreach { case (k, est) =>
      val ex = exact(k).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"$k: est $est vs exact $ex")
    }
    // the same daily sketches also merge to any other grain: month
    // estimates from day partials stay within tolerance of exact
    val monthly = Moments
      .reaggregateDistinct(daily, "month")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(3))
      .toMap
    val exactMonth = events
      .select(date_trunc("month", col("ts")).as("ts"), col("user_id").cast("string").as("user_id"), col("event_type"))
      .unpivot(Array(col("ts")), Array(col("user_id"), col("event_type")), "instance", "_v")
      .groupBy("ts", "instance")
      .agg(count_distinct(col("_v")).as("d"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(monthly.keySet == exactMonth.keySet)
    monthly.foreach { case (k, est) =>
      val ex = exactMonth(k).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"$k: est $est vs exact $ex")
    }
  }
}
