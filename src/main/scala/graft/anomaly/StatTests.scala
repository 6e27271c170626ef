package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed statistical hypothesis tests (SURVEY §2.2) — the
  * significance layer on top of the descriptive operators: Theil-Sen
  * says HOW steep the trend is, Mann-Kendall says whether to believe
  * it; the contribution table says WHICH segment moved, the proportion
  * z says whether the move beats noise.
  *
  * Everything emits TEST STATISTICS (z, χ²) rather than p-values: the
  * inverse-error function is not a portable builtin, and thresholding
  * z at 1.96 / χ² at the critical value is the monitoring-pipeline
  * contract anyway (compare statistic > threshold, alert).
  */
object StatTests {

  import graft.functions.round6

  /** Pearson χ² test of independence between two categorical columns,
    * plus Cramér's V effect size: `(n, card_a, card_b, dof, chi2,
    * cramers_v)` in one row. The data-quality question it answers:
    * "is this column actually independent of that one?" — a leaking
    * join or copy-paste bug shows as a huge χ² between columns that
    * should not know about each other.
    *
    * Zero cells of the contingency table still contribute their
    * expected mass (dense spine via per-side distincts), and both
    * side cardinalities carry an explicit generous bound
    * (`maxCategories`, TakeOrdered — the |A|×|B| grid must stay a
    * grid; χ² over unbounded cardinality is meaningless anyway).
    * When the cap binds, margins and the total recompute from the
    * kept cells (a self-consistent sub-table — Σ expected == n) and
    * the `truncated` output column flips true.
    * NULL categories are excluded (they are a missingness question —
    * [[graft.profiler.Profiler.nullCorrelationProfile]]'s job).
    *
    * Scale shape: ONE (a, b) count aggregation over raw data
    * (map-side-combinable); margins, expectations, and the χ² fold
    * all run at |A|×|B| grain.
    */
  def chiSquare(
      df: DataFrame,
      colA: String,
      colB: String,
      maxCategories: Int = 1000
  ): DataFrame = {
    require(maxCategories >= 2, s"maxCategories must be >= 2, got $maxCategories")
    val base = df.where(col(colA).isNotNull && col(colB).isNotNull)
    val counts = base
      .groupBy(col(colA).cast("string").as("_a"), col(colB).cast("string").as("_b"))
      .agg(count(lit(1)).as("_n"))
    // When a side exceeds the cap, the χ² is computed over the KEPT
    // sub-grid as a self-consistent contingency table: margins AND the
    // total recompute from the kept cells, so Σ expected == n always
    // holds (full-table totals over a truncated grid bias χ² low).
    // `truncated` reports when the cap bound; full cardinalities decide
    // it, kept cardinalities are what card_a/card_b describe.
    val keptA = counts.select("_a").distinct().orderBy("_a").limit(maxCategories)
    val keptB = counts.select("_b").distinct().orderBy("_b").limit(maxCategories)
    val kept = counts
      .join(broadcast(keptA), Seq("_a"), "left_semi")
      .join(broadcast(keptB), Seq("_b"), "left_semi")
    val aSide = kept
      .groupBy("_a")
      .agg(sum(col("_n")).as("_na"))
      .withColumn("_k", lit(1))
    val bSide = kept
      .groupBy("_b")
      .agg(sum(col("_n")).as("_nb"))
      .withColumn("_k", lit(1))
    val total = kept.agg(sum(col("_n")).as("_nt")).withColumn("_k", lit(1))
    val full = counts
      .agg(
        countDistinct(col("_a")).as("_fa"),
        countDistinct(col("_b")).as("_fb")
      )
      .withColumn("_k", lit(1))
    val grid = aSide
      .join(broadcast(bSide), "_k")
      .join(broadcast(total), "_k")
      .join(broadcast(full), "_k")
      .join(kept, Seq("_a", "_b"), "left")
      .withColumn("_o", coalesce(col("_n"), lit(0L)).cast("double"))
      .withColumn(
        "_e",
        col("_na").cast("double") * col("_nb") / col("_nt")
      )
    grid
      .agg(
        max(col("_nt")).as("n"),
        countDistinct(col("_a")).as("card_a"),
        countDistinct(col("_b")).as("card_b"),
        max(col("_fa")).as("_fa"),
        max(col("_fb")).as("_fb"),
        sum((col("_o") - col("_e")) * (col("_o") - col("_e")) / col("_e"))
          .as("_chi2")
      )
      .select(
        col("n"),
        col("card_a"),
        col("card_b"),
        ((col("card_a") - 1) * (col("card_b") - 1)).as("dof"),
        round6(col("_chi2")).as("chi2"),
        // a cardinality-1 side has no association to measure: the
        // denominator is 0 and chi2 is 0, so 0/0 would ride out as a
        // NaN that every downstream comparison silently treats as
        // false — NULL is the honest "undefined", distinguishable
        // from a real zero-effect measurement
        when(
          least(col("card_a") - 1, col("card_b") - 1) > 0,
          round6(
            sqrt(
              col("_chi2") / (col("n") *
                least(col("card_a") - 1, col("card_b") - 1))
            )
          )
        ).as("cramers_v"),
        (col("_fa") > maxCategories || col("_fb") > maxCategories)
          .as("truncated")
      )
  }

  /** Deterministic per-series thinning for the O(n²)-in-length pair
    * tests ([[mannKendall]], [[Trend.theilSen]]): series longer than
    * `maxPoints` keep every stride-th observation (stride =
    * ceil(n/maxPoints), starting at the first), bounding the pair
    * join at maxPoints²/2 rows per series no matter what grain the
    * caller points at it — the same up-front cost cap as
    * [[graft.operators.Graph.commonNeighbors]]'s `maxCenterDegree`.
    * Thinning is a pure function of per-series length, so repeated
    * runs pick identical points; `_i` keeps ORIGINAL index units
    * (slopes stay per-observation-step). Series at or under the cap
    * pass through bit-identically (stride 1 keeps every row), and a
    * `_thinned` marker column records whether the cap bound — the
    * callers surface it as an output column, because a silently
    * approximated z/slope is the one thing worse than a refused one.
    *
    * Expects `_i` already assigned by a row_number over `w`'s
    * ordering; the count rides the same window spec, so no extra
    * exchange or sort.
    */
  private[anomaly] def thinSeries(
      indexed: DataFrame,
      w: org.apache.spark.sql.expressions.WindowSpec,
      maxPoints: Int
  ): DataFrame =
    indexed
      .withColumn(
        "_cnt",
        count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
      )
      .withColumn(
        "_stride",
        floor((col("_cnt") + lit(maxPoints - 1)) / lit(maxPoints)).cast("long")
      )
      .where(((col("_i") - 1) % col("_stride")) === 0)
      .withColumn("_thinned", col("_cnt") > maxPoints)
      .drop("_cnt", "_stride")

  /** Mann-Kendall trend test per series: `(seriesCols..., n, s, z,
    * trend)` where S = Σ_{i<j} sign(x_j − x_i), z applies the
    * standard continuity correction against Var(S) WITH the tie
    * correction term, and `trend` thresholds z at ±1.96 →
    * increasing / decreasing / none. The significance companion to
    * [[Trend.theilSen]] — same O(n²)-in-series-length pair shape,
    * parallelizing across series; series longer than `maxPoints`
    * thin deterministically via [[thinSeries]] so an event-grain
    * caller cannot detonate a 10¹²-row pair join.
    *
    * Pure integer pair counts + one sqrt — engine-exact arithmetic.
    */
  def mannKendall(
      series: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      maxPoints: Int = 10000
  ): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val keys = seriesCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val indexed = thinSeries(
      series
        .select(keys ++ Seq(col(tsCol), col(valueCol).as("_v")): _*)
        .withColumn("_i", row_number().over(w)),
      w,
      maxPoints
    ).select(keys ++ Seq(col("_i"), col("_v"), col("_thinned")): _*)
    val sTable = indexed
      .as("a")
      .join(indexed.as("b"), seriesCols)
      .where(col("a._i") < col("b._i"))
      .groupBy(seriesCols.head, seriesCols.tail: _*)
      .agg(
        sum(signum(col("b._v") - col("a._v")).cast("long")).as("s")
      )
    val nTable = indexed
      .groupBy(seriesCols.head, seriesCols.tail: _*)
      .agg(count(lit(1)).as("n"), max(col("_thinned")).as("thinned"))
    // tie correction: groups of equal values shrink Var(S)
    val ties = indexed
      .groupBy(keys :+ col("_v"): _*)
      .agg(count(lit(1)).as("_t"))
      .where(col("_t") > 1)
      .groupBy(seriesCols.head, seriesCols.tail: _*)
      .agg(
        sum(col("_t") * (col("_t") - 1) * (lit(2) * col("_t") + 5)).as("_tc")
      )
    val joined = nTable
      .join(sTable, seriesCols)
      .join(ties, seriesCols, "left")
      .withColumn("_tc", coalesce(col("_tc"), lit(0L)))
      .withColumn(
        "_var",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("_tc")) /
          lit(18.0)
      )
    val z = when(col("_var") > 0 && col("s") > 0,
      (col("s") - 1) / sqrt(col("_var")))
      .when(col("_var") > 0 && col("s") < 0, (col("s") + 1) / sqrt(col("_var")))
      .when(col("_var") > 0, lit(0.0))
    joined
      .withColumn("z", round6(z))
      .withColumn(
        "trend",
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing")
          .otherwise("none")
      )
      .select(
        keys ++ Seq(col("n"), col("s"), col("z"), col("trend"), col("thinned")): _*
      )
  }

  /** Day-over-day two-proportion z-test of a row-level condition:
    * per consecutive-calendar-day pair, `(day, n_prev, n_cur, p_prev,
    * p_cur, z)` where z = (p₂ − p₁) / sqrt(p̂(1−p̂)(1/n₁ + 1/n₂)) with
    * the pooled p̂ — "did the error rate / conversion REALLY move or
    * is that noise at this traffic level". Degenerate pairs (pooled
    * rate 0 or 1 — no variance) emit NULL z.
    *
    * Scale shape: one map-side-combinable (day) aggregation of the
    * 0/1 condition; pairing is a lag window over the |days| table.
    */
  def proportionDrift(
      df: DataFrame,
      tsCol: String,
      condition: Column
  ): DataFrame = {
    val perDay = df
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(condition, 1L).otherwise(0L)).as("k")
      )
    val w = Window.orderBy(col("day"))
    val paired = perDay
      .withColumn("_pn", lag(col("n"), 1).over(w))
      .withColumn("_pk", lag(col("k"), 1).over(w))
      .withColumn("_pday", lag(col("day"), 1).over(w))
      .where(datediff(col("day"), col("_pday")) === 1)
    val pPrev = col("_pk").cast("double") / col("_pn")
    val pCur = col("k").cast("double") / col("n")
    val pooled = (col("_pk") + col("k")).cast("double") / (col("_pn") + col("n"))
    val se = sqrt(
      pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("_pn") + lit(1.0) / col("n"))
    )
    paired.select(
      col("day"),
      col("_pn").as("n_prev"),
      col("n").as("n_cur"),
      round6(pPrev).as("p_prev"),
      round6(pCur).as("p_cur"),
      when(pooled > 0 && pooled < 1, round6((pCur - pPrev) / se)).as("z")
    )
  }
}
