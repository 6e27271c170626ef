package graft.profiler

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips to the group's exact quantile_cont bounds") {
    // g1 = 1..10: p05 = 1.45, p95 = 9.55 (linear interpolation)
    val df = (1 to 10).map(i => ("g1", i.toDouble)).toDF("g", "v")
    val out = Clean
      .winsorize(df, "v", Seq("g"), lo = 0.05, hi = 0.95)
      .orderBy("v")
      .select("v", "v_winsorized")
      .as[(Double, Double)]
      .collect()
    assert(out.head._1 == 1.0 && math.abs(out.head._2 - 1.45) < 1e-12)
    assert(out.last._1 == 10.0 && math.abs(out.last._2 - 9.55) < 1e-12)
    // interior values untouched
    assert(out.filter(p => p._1 > 1.45 && p._1 < 9.55).forall(p => p._1 == p._2))
  }

  test("groups are independent; nulls propagate instead of clamping to lo") {
    val df = Seq(
      ("a", Some(0.0)), ("a", Some(100.0)), ("a", Some(50.0)), ("a", None),
      ("b", Some(7.0))
    ).toDF("g", "v")
    val out = Clean
      .winsorize(df, "v", Seq("g"), lo = 0.25, hi = 0.75)
      .collect()
      .map(r => (r.getString(r.fieldIndex("g")), Option(r.get(r.fieldIndex("v"))), Option(r.get(r.fieldIndex("v_winsorized")))))
    assert(out.exists(t => t._1 == "a" && t._2.isEmpty && t._3.isEmpty),
      "null value must stay null")
    // singleton group clips to itself
    assert(out.filter(_._1 == "b").forall(t => t._3.contains(7.0)))
    // group a bounds come only from a's values: p25 of (0,50,100) = 25
    val aMin = out.filter(t => t._1 == "a" && t._2.contains(0.0)).head
    assert(aMin._3.contains(25.0))
  }

  test("a NULL group is winsorized against its own bounds, never dropped") {
    // a null-unsafe equi-join would silently delete every NULL-group
    // row — the qualityCut/mixtureTemperature null-safe-join rule
    val df = Seq(
      (Option("a"), Some(1.0)), (Option("a"), Some(9.0)),
      (Option.empty[String], Some(100.0)), (Option.empty[String], Some(900.0)),
      (Option.empty[String], Some(500.0))
    ).toDF("g", "v")
    val out = Clean.winsorize(df, "v", Seq("g"), lo = 0.25, hi = 0.75).collect()
    assert(out.length == 5, s"NULL-group rows must survive, got ${out.length}")
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.length == 3)
    // p25/p75 of (100,500,900) = 300/700 — bounds from the NULL group itself
    val w = nullRows.map(_.getAs[Double]("v_winsorized")).sorted
    assert(w.toSeq == Seq(300.0, 500.0, 700.0))
  }
}
