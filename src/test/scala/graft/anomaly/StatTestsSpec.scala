package graft.anomaly

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  test("chi-square: textbook 2x2 contingency, zero cells contribute expected mass") {
    // O = [[10,20],[20,10]] -> E = 15 everywhere, chi2 = 4*25/15 = 20/3
    val rows = Seq.fill(10)(("x", "l")) ++ Seq.fill(20)(("x", "r")) ++
      Seq.fill(20)(("y", "l")) ++ Seq.fill(10)(("y", "r"))
    val got = StatTests
      .chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Double, Double)]
      .collect()
      .head
    assert(got._1 == 60L && got._2 == 2L && got._3 == 2L && got._4 == 1L)
    assert(math.abs(got._5 - 20.0 / 3) < 1e-6)
    assert(math.abs(got._6 - math.sqrt(20.0 / 3 / 60)) < 1e-6)
    // zero cell: third category only ever with 'l'
    val withZero = (rows ++ Seq.fill(6)(("z", "l"))).toDF("a", "b")
    val z = StatTests.chiSquare(withZero, "a", "b")
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(z._2 == 3L && z._4 == 2L)
    // the (z, r) zero cell must contribute its expected count
    assert(z._5 > got._5, "zero cell raises the statistic")
  }

  test("mann-kendall: monotone series significant, constant series has no verdict") {
    def series(vals: Seq[Double]) = vals.zipWithIndex
      .map { case (v, i) =>
        ("m", java.sql.Timestamp.valueOf(f"2025-01-${i + 1}%02d 00:00:00"), v)
      }
      .toDF("metric", "ts", "value")
    val up = StatTests
      .mannKendall(series((1 to 10).map(_.toDouble)), Seq("metric"))
      .as[(String, Long, Long, Option[Double], String)]
      .collect()
      .head
    // S = 45, var = 10*9*25/18 = 125, z = 44/sqrt(125)
    assert(up._3 == 45L)
    assert(math.abs(up._4.get - 44.0 / math.sqrt(125)) < 1e-6)
    assert(up._5 == "increasing")
    val flat = StatTests
      .mannKendall(series(Seq.fill(8)(3.0)), Seq("metric"))
      .as[(String, Long, Long, Option[Double], String)]
      .collect()
      .head
    assert(flat._3 == 0L && flat._4.isEmpty && flat._5 == "none")
  }

  test("proportion drift: hand-computed pooled z") {
    def day(d: Int, hit: Int, miss: Int) =
      Seq.fill(hit)((java.sql.Timestamp.valueOf(f"2025-01-$d%02d 10:00:00"), true)) ++
        Seq.fill(miss)((java.sql.Timestamp.valueOf(f"2025-01-$d%02d 11:00:00"), false))
    val df = (day(1, 5, 45) ++ day(2, 15, 35)).toDF("ts", "hit")
    val got = StatTests
      .proportionDrift(df, "ts", col("hit"))
      .as[(java.sql.Timestamp, Long, Long, Double, Double, Option[Double])]
      .collect()
      .head
    assert(got._2 == 50L && got._3 == 50L)
    assert(got._4 == 0.1 && got._5 == 0.3)
    // pooled 0.2, se = sqrt(0.2*0.8*(1/50+1/50)) = 0.08, z = 2.5
    assert(math.abs(got._6.get - 2.5) < 1e-6)
    // all-hit days: pooled 1 -> no variance -> NULL z
    val degenerate = (day(1, 10, 0) ++ day(2, 10, 0)).toDF("ts", "hit")
    val dz = StatTests.proportionDrift(degenerate, "ts", col("hit"))
      .select("z").as[Option[Double]].collect().head
    assert(dz.isEmpty)
  }
}
