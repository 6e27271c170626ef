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
      .as[(Long, Long, Long, Long, Double, Double, Boolean)]
      .collect()
      .head
    assert(got._1 == 60L && got._2 == 2L && got._3 == 2L && got._4 == 1L)
    assert(math.abs(got._5 - 20.0 / 3) < 1e-6)
    assert(math.abs(got._6 - math.sqrt(20.0 / 3 / 60)) < 1e-6)
    assert(!got._7, "cap untouched -> not truncated")
    // zero cell: third category only ever with 'l'
    val withZero = (rows ++ Seq.fill(6)(("z", "l"))).toDF("a", "b")
    val z = StatTests.chiSquare(withZero, "a", "b")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect().head
    assert(z._2 == 3L && z._4 == 2L)
    // the (z, r) zero cell must contribute its expected count
    assert(z._5 > got._5, "zero cell raises the statistic")
    // cardinality-1 side: no association to measure — cramers_v must be
    // NULL (undefined), not the NaN of sqrt(0/0), which every
    // downstream comparison silently treats as false
    val constant = Seq.fill(30)(("only", "l")) ++ Seq.fill(30)(("only", "r"))
    val cRow = StatTests.chiSquare(constant.toDF("a", "b"), "a", "b").collect().head
    assert(cRow.getAs[Long]("card_a") == 1L)
    assert(cRow.isNullAt(cRow.fieldIndex("cramers_v")),
      s"expected NULL cramers_v, got ${cRow.get(cRow.fieldIndex("cramers_v"))}")
  }

  test("chi-square: capped grid recomputes totals from kept categories") {
    // 5 a-categories x 2 b-categories, cap a at 3 -> kept sub-grid is
    // a in {a1,a2,a3}. The capped run must equal an UNCAPPED run over
    // only those categories (self-consistent sub-table, sum E == n),
    // except for the truncated flag and the kept-vs-full cardinality.
    val rows = (1 to 5).flatMap { i =>
      Seq.fill(4 + i)((s"a$i", "l")) ++ Seq.fill(9 - i)((s"a$i", "r"))
    }
    val df = rows.toDF("a", "b")
    val capped = StatTests.chiSquare(df, "a", "b", maxCategories = 3)
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect().head
    val sub = StatTests.chiSquare(
      df.where(col("a").isin("a1", "a2", "a3")), "a", "b")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect().head
    assert(capped._7, "cap bound -> truncated flag set")
    assert(!sub._7)
    // n is the KEPT total (sum of expected == n), not the full table's
    assert(capped._1 == sub._1)
    assert(capped._2 == 3L && capped._3 == 2L)
    assert(capped._5 == sub._5, "chi2 identical to the kept-only run")
    assert(capped._6 == sub._6, "cramers_v identical to the kept-only run")
  }

  test("mann-kendall: monotone series significant, constant series has no verdict") {
    def series(vals: Seq[Double]) = vals.zipWithIndex
      .map { case (v, i) =>
        ("m", java.sql.Timestamp.valueOf(f"2025-01-${i + 1}%02d 00:00:00"), v)
      }
      .toDF("metric", "ts", "value")
    val up = StatTests
      .mannKendall(series((1 to 10).map(_.toDouble)), Seq("metric"))
      .as[(String, Long, Long, Option[Double], String, Boolean)]
      .collect()
      .head
    // S = 45, var = 10*9*25/18 = 125, z = 44/sqrt(125)
    assert(up._3 == 45L)
    assert(math.abs(up._4.get - 44.0 / math.sqrt(125)) < 1e-6)
    assert(up._5 == "increasing")
    val flat = StatTests
      .mannKendall(series(Seq.fill(8)(3.0)), Seq("metric"))
      .as[(String, Long, Long, Option[Double], String, Boolean)]
      .collect()
      .head
    assert(flat._3 == 0L && flat._4.isEmpty && flat._5 == "none")
  }

  test("mann-kendall: series over maxPoints thin deterministically") {
    // 100 points, cap 10 -> stride 10 keeps _i = 1,11,...,91 (10 points)
    val series = (1 to 100)
      .map(i => ("m", new java.sql.Timestamp(86400000L * i), i.toDouble))
      .toDF("metric", "ts", "value")
    val thin = StatTests
      .mannKendall(series, Seq("metric"), maxPoints = 10)
      .as[(String, Long, Long, Option[Double], String, Boolean)]
      .collect()
      .head
    assert(thin._2 == 10L, "kept exactly ceil(100/10)=10 points")
    assert(thin._6, "thinned flag set when the cap binds")
    // monotone stays monotone after even thinning: S = C(10,2) = 45
    assert(thin._3 == 45L && thin._5 == "increasing")
    // deterministic: a second run picks the identical points
    val again = StatTests
      .mannKendall(series, Seq("metric"), maxPoints = 10)
      .as[(String, Long, Long, Option[Double], String, Boolean)]
      .collect()
      .head
    assert(thin == again)
    // at-or-under the cap passes through untouched
    val full = StatTests
      .mannKendall(series, Seq("metric"), maxPoints = 100)
      .as[(String, Long, Long, Option[Double], String, Boolean)]
      .collect()
      .head
    assert(full._2 == 100L)
    assert(!full._6, "at-or-under the cap is not thinned")
    intercept[IllegalArgumentException] {
      StatTests.mannKendall(series, Seq("metric"), maxPoints = 1)
    }
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
