package graft.anomaly

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def mkSeries(vals: Seq[Double], key: String = "m") =
    vals.zipWithIndex
      .map { case (v, i) => (key, f"2025-01-${i + 1}%02d 00:00:00", v) }
      .toDF("metric", "ts_raw", "value")
      .select($"metric", to_timestamp($"ts_raw").as("ts"), $"value")

  test("Theil-Sen thins long series but keeps original index units") {
    // v = 2*i over 100 points; cap 25 -> stride 4 keeps 25 points at
    // original indices 1,5,...,97 — slopes stay (v_j-v_i)/(j-i) = 2.0
    // per ORIGINAL observation step, so thinning must not rescale them
    val series = (1 to 100)
      .map(i => ("m", new java.sql.Timestamp(86400000L * i), 2.0 * i))
      .toDF("metric", "ts", "value")
    val got = Trend
      .theilSen(series, Seq("metric"), maxPoints = 25)
      .as[(String, Long, Double, Double, Boolean)]
      .collect()
      .head
    assert(got._2 == 25L, "kept ceil(100/4)=25 points")
    assert(got._3 == 2.0, "slope in original index units")
    assert(got._5, "thinned flag set when the cap binds")
    intercept[IllegalArgumentException] {
      Trend.theilSen(series, Seq("metric"), maxPoints = 1)
    }
  }

  test("Theil-Sen recovers an exact linear trend") {
    // v = 3 + 2*i: every pairwise slope is 2, intercept median = 3
    val out = Trend
      .theilSen(mkSeries((1 to 8).map(i => 3.0 + 2.0 * i)), Seq("metric"))
      .as[(String, Long, Double, Double, Boolean)]
      .collect()
    assert(out.toSeq == Seq(("m", 8L, 2.0, 3.0, false)))
  }

  test("one wild outlier does not move the slope (OLS would tilt)") {
    val clean = (1 to 11).map(i => 10.0 + 1.0 * i)
    val dirty = clean.updated(5, 1000.0)
    val out = Trend
      .theilSen(mkSeries(dirty), Seq("metric"))
      .as[(String, Long, Double, Double, Boolean)]
      .collect()
      .head
    assert(out._3 == 1.0, s"median slope must ignore the spike, got ${out._3}")
  }

  test("decompose: trend nulls at edges, seasonal sums to zero, components re-add") {
    // 3 full weekly cycles with a linear drift: phase pattern repeats
    val pattern = Seq(5.0, 1.0, -2.0, 0.0, 3.0, -4.0, -3.0)
    val vals = (0 until 21).map(i => 100.0 + 0.5 * i + pattern(i % 7))
    val out = Trend
      .decompose(mkSeries(vals), Seq("metric"), period = 7)
      .orderBy("ts")
      .as[(String, java.sql.Timestamp, Double, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(out.take(3).forall(_._5.isEmpty) && out.takeRight(3).forall(_._5.isEmpty))
    assert(out.drop(3).dropRight(3).forall(_._5.isDefined))
    val seasonal = out.take(7).flatMap(_._6)
    assert(math.abs(seasonal.sum) < 1e-5, s"seasonal must center to zero: $seasonal")
    // interior rows reconstruct: value = trend + seasonal + resid
    out.filter(_._5.isDefined).foreach { r =>
      assert(math.abs(r._3 - (r._5.get + r._6.get + r._7.get)) < 1e-5)
    }
    // the centered MA of a pure (linear + periodic) signal is the line
    val mid = out(10)
    assert(math.abs(mid._5.get - (100.0 + 0.5 * 10)) < 1e-6)
  }

  test("decompose on a series shorter than the period keeps rows with null components") {
    val out = Trend
      .decompose(mkSeries(Seq(1.0, 2.0, 3.0)), Seq("metric"), period = 7)
      .as[(String, java.sql.Timestamp, Double, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(out.length == 3)
    assert(out.forall(r => r._5.isEmpty && r._6.isEmpty && r._7.isEmpty))
  }

  test("residual score flags a masked outlier a raw robust-z misses") {
    // sawtooth (period 4) + linear trend + small co-prime noise; one
    // point nudged off its seasonal slot — big in residual space,
    // ordinary in raw space. Long series so the nudge can't
    // contaminate its own phase mean into silence
    val season = Seq(0.0, 10.0, 0.0, 10.0)
    val clean =
      (0 until 40).map(i => 100.0 + i + season(i % 4) + ((i * 7) % 5 - 2) * 0.5)
    val dirty = clean.updated(20, clean(20) + 6.0)
    // 40 days overflow mkSeries' January literals — build from LocalDate
    val longSeries = dirty.zipWithIndex
      .map { case (v, i) =>
        val d = java.time.LocalDate.of(2025, 1, 1).plusDays(i.toLong)
        ("m", java.sql.Timestamp.valueOf(d.atStartOfDay()), v)
      }
      .toDF("metric", "ts", "value")
    val out = Trend
      .residualScore(longSeries, Seq("metric"), period = 4)
      .orderBy("ts")
      .select("value", "resid", "score", "is_anomaly")
      .as[(Double, Option[Double], Option[Double], Boolean)]
      .collect()
    // edges: no trend window -> no resid -> no verdict
    assert(out.take(2).forall(r => r._2.isEmpty && r._3.isEmpty && !r._4))
    val flagged = out.zipWithIndex.filter(_._1._4).map(_._2)
    assert(flagged.toSeq == Seq(20), s"exactly the nudged slot flags, got ${flagged.toSeq}")
    // the raw robust-z over the same series stays quiet at index 20:
    // trend + seasonal swing dwarf a 6-unit nudge in raw space
    val sorted = dirty.sorted
    val med = (sorted(19) + sorted(20)) / 2
    val devs = dirty.map(v => math.abs(v - med)).sorted
    val rawMad = (devs(19) + devs(20)) / 2
    assert(math.abs(0.6745 * (dirty(20) - med) / rawMad) < 3.5)
  }

  test("ols: exact line recovered with r2 = 1; constant y keeps slope 0, r2 undefined") {
    val line = Trend
      .olsTrend(mkSeries((1 to 8).map(i => 3.0 + 2.0 * i)), Seq("metric"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
      .head
    assert(line._2 == 8L && line._3.contains(2.0) && line._4.contains(3.0))
    assert(line._5.contains(1.0))
    val flat = Trend
      .olsTrend(mkSeries(Seq.fill(6)(7.0)), Seq("metric"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
      .head
    assert(flat._3.contains(0.0) && flat._4.contains(7.0) && flat._5.isEmpty)
  }

  test("acf: exact alternating series gives the textbook lag signs") {
    // x = +1,-1,... mean 0: acf1 = -7/8, acf2 = +6/8, acf3 = -5/8
    val vals = (0 until 8).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val got = Trend
      .acf(mkSeries(vals), Seq("metric"), maxLag = 3)
      .orderBy("lag")
      .as[(String, Int, Long, Option[Double])]
      .collect()
      .map(r => (r._2, r._3, r._4.get))
      .toSeq
    assert(got == Seq((1, 7L, -0.875), (2, 6L, 0.75), (3, 5L, -0.625)))
  }

  test("acf: n_pairs counts only pairs with BOTH ends non-null") {
    // [1, NULL, 3, 4] at lag 1: only the (3,4) pair contributes — a
    // raw count(lead) would report 2 and misprice any
    // 1.96/sqrt(n_pairs) significance band
    val withNull = Seq(Some(1.0), None, Some(3.0), Some(4.0)).zipWithIndex
      .map { case (v, i) => ("m", f"2025-01-${i + 1}%02d 00:00:00", v) }
      .toDF("metric", "ts_raw", "value")
      .select($"metric", to_timestamp($"ts_raw").as("ts"), $"value")
    val got = Trend
      .acf(withNull, Seq("metric"), maxLag = 1)
      .select("n_pairs")
      .as[Long]
      .collect()
      .head
    assert(got == 1L, s"expected 1 complete pair, got $got")
  }

  test("acf: constant series has zero denominator and NULL acf") {
    val got = Trend
      .acf(mkSeries(Seq.fill(6)(5.0)), Seq("metric"), maxLag = 2)
      .select("acf")
      .as[Option[Double]]
      .collect()
    assert(got.forall(_.isEmpty))
  }

  test("residual score: constant residuals give NULL score, not a verdict") {
    // pure seasonal + flat level -> residuals all ~0 -> mad 0
    val season = Seq(0.0, 5.0)
    val vals = (0 until 12).map(i => 50.0 + season(i % 2))
    val out = Trend
      .residualScore(mkSeries(vals), Seq("metric"), period = 2)
      .select("score", "is_anomaly")
      .as[(Option[Double], Boolean)]
      .collect()
    assert(out.forall(r => r._1.isEmpty && !r._2))
  }
}
