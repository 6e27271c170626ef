package graft.profiler

import graft.SparkSpec
import graft.core.Granularity
import graft.testing.DataFrameAssertions.assertDataFrameEquality
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    // (ts, num, str)
    ("2025-01-01 10:00:00", Some(1.0), Some("a")),
    ("2025-01-01 11:00:00", Some(3.0), Some("b")),
    ("2025-01-01 12:00:00", None, Some("a")),
    ("2025-01-02 09:00:00", Some(10.0), None),
    ("2025-01-02 10:00:00", Some(20.0), Some("c"))
  ).toDF("ts_raw", "num", "str")
    .select(to_timestamp($"ts_raw").as("ts"), $"num", $"str")

  test("default profile computes all metrics for all days in one pass") {
    val out = Profiler.profile(sample, "ts").cache()
    def v(day: String, entity: String, instance: String, name: String): Option[Double] =
      out
        .where(
          $"ts" === to_timestamp(lit(day)) && $"entity" === entity &&
            $"instance" === instance && $"name" === name
        )
        .collect()
        .headOption
        .map(r => Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue).getOrElse(Double.NaN))

    assert(v("2025-01-01", "Dataset", "*", "Size").contains(3.0))
    assert(v("2025-01-02", "Dataset", "*", "Size").contains(2.0))
    assert(v("2025-01-01", "Column", "num", "Mean").contains(2.0))
    assert(v("2025-01-02", "Column", "num", "Mean").contains(15.0))
    assert(math.abs(v("2025-01-01", "Column", "num", "Completeness").get - 2.0 / 3) < 1e-9)
    assert(v("2025-01-02", "Column", "str", "Completeness").contains(0.5))
    assert(v("2025-01-01", "Column", "str", "CountDistinct").contains(2.0))
    // exact physical plan property: exactly one aggregate over the scan
    val plan = Profiler.profile(sample, "ts").queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "single-pass profile must not join")
  }

  test("quantiles match manual percentiles") {
    val out = Profiler.profile(sample, "ts")
    val q50 = out
      .where($"name" === "ApproxQuantile-0.5" || $"name" === "Quantile-0.5")
      .where($"ts" === to_timestamp(lit("2025-01-01")) && $"instance" === "num")
      .select("value")
      .as[Double]
      .collect()
    assert(q50.nonEmpty && math.abs(q50.head - 2.0) < 1e-9) // median of (1,3)
  }

  test("pluggable builder: custom analyzer set and type mapping") {
    val builder = new ProfilingBuilder(
      typeMappings = Seq(
        TypeMapping(_.isInstanceOf[NumericType], Seq(Analyzers.Min, Analyzers.Max, Analyzers.Sum))
      ),
      datasetAnalyzers = Seq(Analyzers.Size)
    )
    val out = Profiler.profile(sample, "ts", builder)
    val names = out.select("name").distinct().as[String].collect().toSet
    assert(names == Set("Minimum", "Maximum", "Sum", "Size"))
    val maxDay1 = out
      .where($"ts" === to_timestamp(lit("2025-01-01")) && $"name" === "Maximum")
      .select("value")
      .as[Double]
      .collect()
      .head
    assert(maxDay1 == 3.0)
  }

  test("skewness/kurtosis analyzers match closed-form values and flag asymmetry") {
    // one day, values with known moments: exponential-ish right tail
    val rows = (Seq.fill(90)(1.0) ++ Seq.fill(9)(5.0) ++ Seq.fill(1)(50.0))
      .zipWithIndex
      .map { case (v, i) => (java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), v) }
      .toDF("ts", "value")
    val builder = new ProfilingBuilder(
      typeMappings = Seq(
        TypeMapping(_.isInstanceOf[NumericType], Seq(Analyzers.Skewness, Analyzers.Kurtosis))
      ),
      datasetAnalyzers = Seq()
    )
    val out = Profiler.profile(rows, "ts", builder).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
    // closed-form population moments computed directly
    val xs = Seq.fill(90)(1.0) ++ Seq.fill(9)(5.0) ++ Seq.fill(1)(50.0)
    def m(k: Int) = xs.map(x => math.pow(x, k)).sum / xs.size
    val v = m(2) - m(1) * m(1)
    val expSkew = (m(3) - 3 * m(1) * m(2) + 2 * math.pow(m(1), 3)) / (v * math.sqrt(v))
    val expKurt = (m(4) - 4 * m(1) * m(3) + 6 * m(1) * m(1) * m(2) - 3 * math.pow(m(1), 4)) / (v * v) - 3
    assert(math.abs(out("Skewness") - expSkew) < 1e-9, s"${out("Skewness")} vs $expSkew")
    assert(math.abs(out("Kurtosis") - expKurt) < 1e-9)
    assert(out("Skewness") > 2.0) // heavy right tail
    // constant column -> NULL (no crash, no division by zero)
    val const = Seq.fill(5)((java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), 7.0)).toDF("ts", "value")
    val c = Profiler.profile(const, "ts", builder).collect()
    assert(c.forall(_.isNullAt(4)))
  }

  test("extended builder emits the full analyzer family in one pass") {
    val out = Profiler.profile(sample, "ts", ProfilingBuilder.extended)
    val names = out.select("name").distinct().as[String].collect().toSet
    assert(
      Set("Mean", "StandardDeviation", "Minimum", "Maximum", "Sum",
        "Skewness", "Kurtosis", "Completeness", "Size").subsetOf(names),
      names.toString
    )
    // still a single-aggregation (join-free) plan
    val optimized = Profiler
      .profile(sample, "ts", ProfilingBuilder.extended)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!optimized.contains("join"))
  }

  test("sketch builder: the quantile triple shares ONE sketch per column") {
    val prof = Profiler.profile(sample, "ts", ProfilingBuilder.sketch)
    // three ApproxQuantile metrics materialize per numeric column...
    val names = prof.select("name").distinct().as[String].collect().toSet
    assert(
      Set("ApproxQuantile-0.25", "ApproxQuantile-0.5", "ApproxQuantile-0.75")
        .subsetOf(names),
      names.toString
    )
    // ...but the plan carries one percentile_approx aggregate per
    // column: PhysicalAggregation dedupes the structurally-identical
    // array-percentile calls the shared analyzers emit
    val numericCols = 1 // `sample` has a single numeric data column
    val plan = prof.queryExecution.executedPlan.toString
    val occurrences = "percentile_approx".r.findAllIn(plan).size
    // each aggregate appears twice in the plan string (partial + final)
    assert(
      occurrences <= 2 * numericCols,
      s"expected one shared sketch per column, plan has $occurrences mentions:\n$plan"
    )
    // values agree with the independent single-q analyzer
    val single = Profiler.profile(
      sample,
      "ts",
      new ProfilingBuilder(
        Seq(TypeMapping(_.isInstanceOf[org.apache.spark.sql.types.NumericType],
          Seq(Analyzers.ApproxQuantile(0.5)))),
        datasetAnalyzers = Seq()
      )
    )
    val a = prof.where($"name" === "ApproxQuantile-0.5").select("ts", "value")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    val b = single.select("ts", "value").as[(java.sql.Timestamp, Double)].collect().toMap
    assert(a == b)
  }

  test("hour granularity buckets by hour") {
    val out = Profiler.profile(sample, "ts", ProfilingBuilder.simple, Granularity.Hour)
    val sizes = out
      .where($"name" === "Size")
      .select("ts", "value")
      .collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(1))
      .toMap
    assert(sizes("2025-01-01 10:00:00.0") == 1.0)
    assert(sizes.size == 5)
  }

  test("compliance, pattern-match, and length analyzers") {
    val builder = new ProfilingBuilder(
      typeMappings = Seq(
        TypeMapping(
          _.isInstanceOf[StringType],
          Seq(Analyzers.PatternMatch("^[ab]$"), Analyzers.MinLength, Analyzers.MaxLength)
        )
      ),
      datasetAnalyzers =
        Seq(Analyzers.Compliance("num_le_5", $"num" <= 5.0))
    )
    val out = Profiler.profile(sample, "ts", builder).cache()
    def v(day: String, name: String): Double =
      out
        .where($"ts" === to_timestamp(lit(day)) && $"name" === name)
        .select("value")
        .as[Double]
        .collect()
        .head
    // day 1: num values 1, 3, null -> null predicate counts non-compliant
    assert(v("2025-01-01", "Compliance(num_le_5)") == 2.0 / 3.0)
    assert(v("2025-01-02", "Compliance(num_le_5)") == 0.0)
    // day 1 strs: a, b, a all match ^[ab]$; day 2: null, c -> 0 of 2
    assert(v("2025-01-01", "PatternMatch(^[ab]$)") == 1.0)
    assert(v("2025-01-02", "PatternMatch(^[ab]$)") == 0.0)
    assert(v("2025-01-01", "MinLength") == 1.0)
    assert(v("2025-01-02", "MaxLength") == 1.0)
  }

  test("uniqueness and entropy profiles") {
    val u = Profiler
      .uniquenessProfile(sample, "ts", "str")
      .where($"ts" === to_timestamp(lit("2025-01-01")))
      .collect()
      .head
    // day1 str values: a, b, a -> distinctness 2/3, uniqueness 1/3
    assert(math.abs(u.getAs[Double]("distinctness") - 2.0 / 3) < 1e-9)
    assert(math.abs(u.getAs[Double]("uniqueness") - 1.0 / 3) < 1e-9)

    val e = Profiler
      .entropyProfile(sample, "ts", "str")
      .where($"ts" === to_timestamp(lit("2025-01-01")))
      .collect()
      .head
    val expected = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(e.getAs[Double]("entropy") - expected) < 1e-9)
  }

  test("a DATA column literally named 'ts' next to another event-time column profiles cleanly") {
    // the event-time column is "event_time"; "ts" is ordinary data
    val tricky = sample
      .withColumnRenamed("ts", "event_time")
      .withColumn("ts", coalesce($"num", lit(0.0)) * 2)
    val day1 = to_timestamp(lit("2025-01-01"))

    val u = Profiler.uniquenessProfile(tricky, "event_time", "str").where($"ts" === day1)
    assert(u.count() == 1) // no ambiguous-reference failure, one day row

    val h = Profiler
      .histogramProfile(tricky, "event_time", "ts", nBuckets = 4, min = 0.0, max = 40.0)
      .where($"ts" === day1)
    assert(h.count() > 0) // the DATA ts column is itself profileable

    val o = Profiler.outlierProfile(tricky, "event_time", "num").where($"ts" === day1)
    assert(o.count() == 1)

    val e = Profiler.entropyProfile(tricky, "event_time", "str").where($"ts" === day1)
    assert(e.count() == 1)

    val t = Profiler.topKValuesProfile(tricky, "event_time", "str", k = 2).where($"ts" === day1)
    assert(t.count() == 2)

    val c = Profiler
      .correlationProfile(tricky, "event_time", Seq("num", "ts"))
      .where($"ts" === day1)
    assert(c.count() == 1)

    val p = Profiler.profile(tricky, "event_time").where($"ts" === day1)
    assert(p.where($"instance" === "ts").count() > 0)
  }

  test("assertDataFrameEquality detects equal and unequal frames") {
    val a = Seq((1, 1.0), (2, 2.0)).toDF("id", "v")
    val b = Seq((2, 2.0 + 1e-12), (1, 1.0)).toDF("id", "v")
    assertDataFrameEquality(a, b, tol = 1e-9)
    val c = Seq((1, 1.5), (2, 2.0)).toDF("id", "v")
    intercept[IllegalArgumentException](assertDataFrameEquality(a, c, tol = 1e-9))
  }

  test("equi-depth buckets balance a skewed column that equi-width collapses") {
    // 8 small values + 2 huge ones in one day: width-10 buckets put
    // 8 rows in bar 0, but quartile boundaries split 8/2 sensibly
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 1000.0, 2000.0))
      .map(v => ("2025-01-01 10:00:00", v))
      .toDF("ts_raw", "v")
      .select(to_timestamp($"ts_raw").as("ts"), $"v")
    val got = Profiler
      .equiDepthProfile(df, "ts", "v", nBuckets = 2)
      .orderBy("bucket")
      .as[(java.sql.Timestamp, String, Long, Double, Double, Long)]
      .collect()
    assert(got.map(_._3).toSeq == Seq(0L, 1L))
    assert(got.map(_._6).toSeq == Seq(5L, 5L), "equal-depth split 5/5")
    // median of 10 ordered values interpolates between 5 and 6
    assert(got(0)._4 == 1.0 && got(0)._5 == 5.5 && got(1)._5 == 2000.0)
  }

  test("FD check separates a holding dependency from a violated one") {
    val df = Seq(
      (1, "a", "x"),
      (1, "a", "y"), // det 1 -> {a}, holds; (1 -> x,y) violated for 3rd col
      (2, "b", "z"),
      (2, "b", "z"),
      (3, "c", "w")
    ).toDF("id", "grp", "val")
    val got = Profiler
      .functionalDependencyProfile(df, Seq(("id", "grp"), ("id", "val")))
      .orderBy("dependent")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect()
      .toSeq
    // id -> grp holds everywhere: 3 groups, 0 violations, consistency 1
    assert(got.head == (("id", "grp", 3L, 0L, 0L, 1L, 1.0)))
    // id -> val: group 1 maps to {x,y} (2 rows violating of 5)
    assert(got(1) == (("id", "val", 3L, 1L, 2L, 2L, 0.6)))
  }

  test("FD check ignores null determinants") {
    val df = Seq(
      (Some(1), "a"),
      (None, "b"),
      (None, "c")
    ).toDF("id", "grp")
    val got = Profiler
      .functionalDependencyProfile(df, Seq(("id", "grp")))
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect()
      .head
    assert(got._3 == 1L && got._4 == 0L && got._7 == 1.0)
  }

  test("a row equal to an inner boundary buckets upward") {
    val df = Seq(1.0, 2.0, 3.0)
      .map(v => ("2025-01-01 10:00:00", v))
      .toDF("ts_raw", "v")
      .select(to_timestamp($"ts_raw").as("ts"), $"v")
    val got = Profiler
      .equiDepthProfile(df, "ts", "v", nBuckets = 2)
      .orderBy("bucket")
      .as[(java.sql.Timestamp, String, Long, Double, Double, Long)]
      .collect()
    // boundary = median = 2.0; the row AT 2.0 goes up: counts 1 / 2
    assert(got.map(t => t._3 -> t._6).toSeq == Seq(0L -> 1L, 1L -> 2L))
  }

  test("key skew profile: hand-computed stats on a skewed key, NULL is a key") {
    // key "a" x 6, "b" x 2, NULL x 2 -> 10 rows, 3 keys
    val df = (Seq.fill(6)(Option("a")) ++ Seq.fill(2)(Option("b")) ++
      Seq.fill(2)(Option.empty[String])).toDF("k")
    val r = Profiler
      .keySkewProfile(df, Seq("k"), topK = 2)
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
      .head
    assert(r._1 == "k" && r._2 == 10L && r._3 == 3L && r._4 == 6L)
    assert(r._5 == 0.6) // top1 = 6/10
    assert(r._6 == 0.8) // top2 = (6+2)/10
    // entropy = ln(10) - (6 ln 6 + 2 ln 2 + 2 ln 2)/10
    val ent = math.log(10) - (6 * math.log(6) + 4 * math.log(2)) / 10
    assert(math.abs(r._7 - ent) < 1e-6)
    // sizes (6,2,2): mean 10/3, var = 44/3 - 100/9 = 32/9
    val cv = math.sqrt(32.0 / 9) / (10.0 / 3)
    assert(math.abs(r._8 - cv) < 1e-6)
  }

  test("overlap sketch: planted 50% overlap estimated within 5%") {
    // X = 1..100, Y = 51..150 -> |X∩Y| = 50, jaccard = 1/3
    val rows = (1 to 100).map(i => ("X", i.toLong)) ++
      (51 to 150).map(i => ("Y", i.toLong))
    val df = rows.toDF("seg", "user")
    val got = Profiler
      .overlapSketchProfile(df, "user", "seg")
      .as[(String, String, Long, Long, Long, Long, Option[Double])]
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r._1 == "X" && r._2 == "Y")
    assert(math.abs(r._3 - 100) <= 5 && math.abs(r._4 - 100) <= 5)
    assert(math.abs(r._5 - 150) <= 8, s"union est ${r._5}")
    assert(math.abs(r._6 - 50) <= 8, s"overlap est ${r._6}")
    assert(math.abs(r._7.get - 1.0 / 3) < 0.05)
  }

  test("benford profile: digit extraction, zero-fill, and hand-computed chi2") {
    val df = Seq(
      Some(1.5), Some(19.0), Some(0.002), Some(300.0), Some(-45.0),
      Some(0.0), // no leading digit -> excluded
      Option.empty[Double]
    ).map(v => ("2025-01-01 10:00:00", v))
      .toDF("ts_raw", "v")
      .select(to_timestamp($"ts_raw").as("ts"), $"v")
    val got = Profiler
      .benfordProfile(df, "ts", "v")
      .orderBy("digit")
      .as[(java.sql.Timestamp, Int, Long, Double, Double, Double)]
      .collect()
    assert(got.length == 9, "all nine digits present even when unobserved")
    val byDigit = got.map(r => r._2 -> r._3).toMap
    assert(byDigit == Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 1L,
      5 -> 0L, 6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 0L))
    assert(got.find(_._2 == 1).get._4 == 0.4)
    // chi2 = sum over digits of (n - 5*p)^2 / (5*p)
    val exp = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
    val chi2 = (1 to 9).map { d =>
      val e = 5 * exp(d); val o = byDigit(d).toDouble
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(got.head._6 - chi2) < 1e-5)
    assert(got.map(_._6).distinct.length == 1, "chi2 repeated on every digit row")
  }

  test("null correlation: perfectly coupled, independent, and degenerate pairs") {
    // a,b null together on rows 1-2 (phi=1); c never null (phi NULL)
    val df = Seq(
      (Option.empty[Int], Option.empty[String], 1),
      (Option.empty[Int], Option.empty[String], 2),
      (Option(1), Option("x"), 3),
      (Option(2), Option("y"), 4)
    ).toDF("a", "b", "c")
    val got = Profiler
      .nullCorrelationProfile(df, Seq("a", "b", "c"))
      .orderBy("col_a", "col_b")
      .as[(String, String, Long, Long, Long, Long, Option[Double])]
      .collect()
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = got(0)
    assert(ab._3 == 4L && ab._4 == 2L && ab._5 == 2L && ab._6 == 2L)
    assert(ab._7.contains(1.0), "co-missing columns have phi 1")
    assert(got(1)._7.isEmpty, "never-null partner leaves phi undefined")
  }

  test("null correlation: anti-correlated missingness has phi -1") {
    val df = Seq(
      (Option.empty[Int], Option("x")),
      (Option(1), Option.empty[String])
    ).toDF("a", "b")
    val got = Profiler
      .nullCorrelationProfile(df, Seq("a", "b"))
      .select("phi")
      .as[Option[Double]]
      .collect()
      .head
    assert(got.contains(-1.0))
  }

  test("key skew profile: uniform key has cv 0 and full-coverage topk") {
    val df = (1 to 8).map(i => s"k${i % 4}").toDF("k")
    val r = Profiler
      .keySkewProfile(df, Seq("k"), topK = 10)
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
      .head
    assert(r._3 == 4L && r._4 == 2L && r._5 == 0.25)
    assert(r._6 == 1.0) // topK > n_keys covers everything
    assert(r._8 == 0.0)
  }
}
