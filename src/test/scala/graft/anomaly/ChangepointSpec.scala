package graft.anomaly

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def mkSeries(vals: Seq[Double], key: String = "m") =
    vals.zipWithIndex
      .map { case (v, i) => (key, f"2025-01-${i + 1}%02d 00:00:00", v) }
      .toDF("metric", "ts_raw", "value")
      .select($"metric", to_timestamp($"ts_raw").as("ts"), $"value")

  test("a sustained mean shift alarms, and the negative statistic peaks AT the changepoint") {
    // 10 days at ~10, then 10 days at 13. Pooled standardization puts
    // each half ~1 sigma from the global mean — never a 4-sigma point —
    // but both runs integrate: the below-mean prefix drives cusum_neg
    // to its maximum exactly at the last pre-shift day (the classic
    // CUSUM changepoint estimate), and the shifted run alarms.
    val vals = Seq(10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 9.9) ++
      Seq.fill(10)(13.0)
    val out = Changepoint
      .cusum(mkSeries(vals), Seq("metric"))
      .orderBy("ts")
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Boolean)]
      .collect()
    assert(out.take(7).forall(!_._7), "early prefix stays quiet")
    assert(out.exists(_._7), "the shift must alarm")
    assert(out.last._5 > 4.0, "positive statistic crosses by the end of the run")
    assert(out.map(_._6).zipWithIndex.maxBy(_._1)._2 == 9,
      "cusum_neg argmax localizes the changepoint at the last pre-shift day")
    // the statistic is monotone over the constant shifted run
    val shifted = out.drop(10).map(_._5)
    assert(shifted.zip(shifted.tail).forall { case (a, b) => b >= a })
  }

  test("downward shift drives cusum_neg, not cusum_pos") {
    val vals = Seq.fill(10)(10.0).zipWithIndex.map { case (v, i) => v + (i % 3) * 0.1 } ++
      Seq.fill(8)(7.0)
    val out = Changepoint
      .cusum(mkSeries(vals), Seq("metric"))
      .orderBy("ts")
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Boolean)]
      .collect()
    assert(out.last._6 > 4.0, "negative statistic crosses")
    assert(out.forall(_._5 <= 4.0), "positive side stays quiet")
  }

  test("constant series standardizes to z=0 and never alarms") {
    val out = Changepoint
      .cusum(mkSeries(Seq.fill(12)(5.0)), Seq("metric"))
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Boolean)]
      .collect()
    assert(out.forall(r => r._4 == 0.0 && r._5 == 0.0 && r._6 == 0.0 && !r._7))
  }

  test("series are independent: a shift in one never alarms the other") {
    // hot: 12+12 split integrates ~0.5/day to cross 4; calm: a +/-1
    // sigma ALTERNATION never accumulates (each up-step's +0.5 is
    // wiped by the next down-step's -1.5)
    val a = mkSeries(Seq.fill(12)(1.0) ++ Seq.fill(12)(9.0), "hot")
    val b = mkSeries((1 to 24).map(i => 5.0 + (i % 2) * 0.2), "calm")
    val out = Changepoint
      .cusum(a.union(b), Seq("metric"))
      .as[(String, java.sql.Timestamp, Double, Double, Double, Double, Boolean)]
      .collect()
    assert(out.filter(_._1 == "calm").forall(!_._7))
    assert(out.filter(_._1 == "hot").exists(_._7))
  }
}
