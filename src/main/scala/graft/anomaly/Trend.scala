package graft.anomaly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Robust trend estimation and classical seasonal decomposition over
  * metric series (SURVEY §2.2) — the descriptive complement to the
  * forecast models: "is this metric drifting, and what is its weekly
  * shape" rather than "what is tomorrow's value".
  */
object Trend {

  import graft.functions.round6

  /** Theil–Sen slope per series: the MEDIAN of all pairwise slopes
    * (v_j - v_i) / (j - i) over observation indices i < j — breakdown
    * point 29%, so a few outlier days cannot tilt the trend the way
    * they tilt an OLS fit. Returns `(seriesCols..., n, slope,
    * intercept)` with the standard median intercept
    * median(v_i - slope * i).
    *
    * Determinism: indices come from a row_number over ts, slopes are
    * pointwise IEEE, and both medians are exact percentiles (the
    * established quantile-parity policy) rounded to 6 dp — the
    * intercept uses the ROUNDED slope so both engines subtract the
    * same number.
    *
    * Scale shape: the pair join is per-series O(n^2) in series LENGTH
    * (not in series count — series parallelize across the cluster);
    * fine for the daily/hourly grains this library profiles (a year of
    * days is ~66k pairs). Series longer than `maxPoints` thin
    * deterministically ([[StatTests.thinSeries]], original index
    * units preserved so the slope stays per-observation-step) — the
    * estimator degrades gracefully and the pair join stays bounded.
    */
  def theilSen(
      series: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      maxPoints: Int = 10000
  ): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val keys = seriesCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val indexed = StatTests
      .thinSeries(
        series
          .select(keys ++ Seq(col(tsCol), col(valueCol).as("_v")): _*)
          .withColumn("_i", row_number().over(w)),
        w,
        maxPoints
      )
      .select(keys ++ Seq(col("_i"), col("_v"), col("_thinned")): _*)
    val pairs = indexed
      .as("a")
      .join(indexed.as("b"), seriesCols)
      .where(col("a._i") < col("b._i"))
      .select(
        seriesCols.map(k => col("a." + k).as(k)) :+
          ((col("b._v") - col("a._v")) / (col("b._i") - col("a._i")))
            .as("_slope"): _*
      )
    val slopes = pairs
      .groupBy(seriesCols.head, seriesCols.tail: _*)
      .agg(round6(percentile(col("_slope"), lit(0.5))).as("slope"))
    indexed
      .join(broadcast(slopes), seriesCols)
      .groupBy(seriesCols.head, seriesCols.tail: _*)
      .agg(
        count(lit(1)).as("n"),
        first(col("slope")).as("slope"),
        round6(percentile(col("_v") - col("slope") * col("_i"), lit(0.5)))
          .as("intercept"),
        // surfaced, not silent: a slope computed on a thinned series
        // is an approximation the caller must be able to see
        max(col("_thinned")).as("thinned")
      )
  }

  /** Classical additive decomposition at a fixed `period`:
    * `value = trend + seasonal + resid` with
    *   - trend: centered moving average over a full window of
    *     `period` rows (null at the edges — no partial windows),
    *   - seasonal: per phase-index mean of the detrended values,
    *     re-centered so the seasonal component sums to zero over one
    *     period (through DECIMAL sums),
    *   - resid: the remainder where trend is defined.
    *
    * Phase is `(row_index - 1) % period` from a row_number over ts, so
    * the decomposition never depends on engine-specific weekday
    * numbering. Every emitted component is rounded to 6 dp, and each
    * downstream component is computed FROM the rounded upstream one —
    * cross-engine noise cannot compound.
    *
    * One ordered window pass + two small aggregations per series;
    * parallelizes across series.
    */
  def decompose(
      series: DataFrame,
      seriesCols: Seq[String],
      period: Int,
      tsCol: String = "ts",
      valueCol: String = "value"
  ): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val keys = seriesCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val half = period / 2
    val wCent = wOrd.rowsBetween(-half, half - (if (period % 2 == 0) 1 else 0))
    val trended = series
      .select(keys ++ Seq(col(tsCol), col(valueCol)): _*)
      .withColumn("_phase", (row_number().over(wOrd) - 1) % period)
      .withColumn(
        "trend",
        when(
          count(col(valueCol)).over(wCent) === period,
          round6(avg(col(valueCol)).over(wCent))
        )
      )
      .withColumn("_detr", col(valueCol) - col("trend"))
    val phaseMeans = trended
      .where(col("trend").isNotNull)
      .groupBy(keys :+ col("_phase"): _*)
      .agg(
        (sum(col("_detr").cast(DecimalType(38, 10))).cast("double") /
          count(col("_detr"))).as("_pm")
      )
    val centered = phaseMeans
      .groupBy(keys: _*)
      .agg(
        (sum(col("_pm").cast(DecimalType(38, 10))).cast("double") /
          count(lit(1))).as("_grand")
      )
    trended
      .join(broadcast(phaseMeans), seriesCols :+ "_phase", "left")
      .join(broadcast(centered), seriesCols, "left")
      .withColumn("seasonal", round6(col("_pm") - col("_grand")))
      .withColumn(
        "resid",
        when(
          col("trend").isNotNull,
          round6(col(valueCol) - col("trend") - col("seasonal"))
        )
      )
      .select(
        keys ++ Seq(
          col(tsCol),
          col(valueCol),
          col("_phase").cast("long").as("phase"),
          col("trend"),
          col("seasonal"),
          col("resid")
        ): _*
      )
  }

  /** Ordinary least squares per series over the observation index:
    * `(seriesCols..., n, slope, intercept, r2)` — the classical
    * companion to [[theilSen]] (fast, moment-based, outlier-sensitive;
    * run both — when they disagree, the outliers are the story). R²
    * quantifies how much of the variance the line explains.
    *
    * One aggregation pass per series: x is the row index (exact
    * integers), and ALL moment sums — x, x², y, y², xy — run through
    * DECIMAL so aggregation order cannot move the fit and Σx² cannot
    * wrap Int64 on multi-million-point series; slope/intercept/R² are
    * pointwise
    * arithmetic on the collected moments, rounded 6 dp. Degenerate
    * series (n < 2 or zero variance in x or y) emit NULL fit.
    */
  def olsTrend(
      series: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value"
  ): DataFrame = {
    val keys = seriesCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val dec = DecimalType(38, 10)
    val indexed = series
      .where(col(valueCol).isNotNull)
      .select(keys ++ Seq(col(tsCol), col(valueCol).as("_y")): _*)
      .withColumn("_x", row_number().over(w).cast("long"))
    // x-moment sums through DECIMAL(38,0) like the y-moments: Σx² ≈
    // n³/3 silently wraps Int64 past ~3M points (5 weeks at 1s grain),
    // and a wrong slope with no error is the worst failure mode.
    // DuckDB's SUM(BIGINT) already returns HUGEINT, so the oracle is
    // unchanged.
    val dec0 = DecimalType(38, 0)
    val m = indexed
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("_x").cast(dec0)).as("_sx"),
        sum((col("_x") * col("_x")).cast(dec0)).as("_sxx"),
        sum(col("_y").cast(dec)).as("_sy"),
        sum((col("_y") * col("_y")).cast(dec)).as("_syy"),
        sum((col("_x") * col("_y")).cast(dec)).as("_sxy")
      )
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double")
    val sxx = col("_sxx").cast("double")
    val sy = col("_sy").cast("double")
    val syy = col("_syy").cast("double")
    val sxy = col("_sxy").cast("double")
    val denX = n * sxx - sx * sx
    val denY = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = num / denX
    m.select(
      keys ++ Seq(
        col("n"),
        when(col("n") >= 2 && denX > 0, round6(slope)).as("slope"),
        when(col("n") >= 2 && denX > 0, round6((sy - slope * sx) / n))
          .as("intercept"),
        when(
          col("n") >= 2 && denX > 0 && denY > 0,
          round6(num * num / (denX * denY))
        ).as("r2")
      ): _*
    )
  }

  /** Sample autocorrelation per series for lags 1..`maxLag` —
    * `(seriesCols..., lag, n_pairs, acf)`. The seasonality
    * fingerprint: a weekly cycle shows as a spike at lag 7, and the
    * decay shape separates trend (slow) from noise (immediate drop);
    * feeds period choice for [[decompose]] and the seasonal models.
    *
    * acf_k = Σ (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)² — the standard
    * biased estimator (shared denominator, so acf is monotone-
    * comparable across lags).
    *
    * Scale shape: one per-series mean aggregation broadcast back, ONE
    * ordered window pass materializing all `maxLag` leads at once,
    * then a single aggregation of DECIMAL-cast products (order-
    * independent — identical in DuckDB) exploded to the lag table.
    * Parallelizes across series; per-series cost is the series
    * length × maxLag.
    */
  def acf(
      series: DataFrame,
      seriesCols: Seq[String],
      maxLag: Int,
      tsCol: String = "ts",
      valueCol: String = "value"
  ): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val dec = DecimalType(38, 12)
    val keys = seriesCols.map(col)
    val means = series
      .groupBy(keys: _*)
      .agg(
        // count the VALUES, not the rows — a NULL-bearing series must
        // not bias the mean low (decompose uses the same convention)
        (sum(col(valueCol).cast(DecimalType(38, 10))).cast("double") /
          count(col(valueCol))).as("_mean")
      )
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val withLeads = (1 to maxLag)
      .foldLeft(series.join(broadcast(means), seriesCols)) { case (df, k) =>
        df.withColumn(s"_l$k", lead(col(valueCol), k).over(wOrd))
      }
    val c = col(valueCol) - col("_mean")
    val aggs = sum((c * c).cast(dec)).as("_den") +:
      (1 to maxLag).flatMap { k =>
        Seq(
          sum((c * (col(s"_l$k") - col("_mean"))).cast(dec)).as(s"_num$k"),
          // pairs where BOTH ends are non-null — the pairs the
          // numerator actually sums; count(lead) alone would count a
          // NULL-current row's pair and overstate n_pairs (and any
          // 1.96/sqrt(n_pairs) significance band built on it)
          count(when(col(valueCol).isNotNull, col(s"_l$k"))).as(s"_cnt$k")
        )
      }
    val wide = withLeads.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val entries = (1 to maxLag).map { k =>
      struct(
        lit(k).as("lag"),
        col(s"_cnt$k").as("n_pairs"),
        when(
          col("_den").cast("double") > 0,
          round6(col(s"_num$k").cast("double") / col("_den").cast("double"))
        ).as("acf")
      )
    }
    wide
      .select(keys :+ explode(array(entries: _*)).as("e"): _*)
      .select(keys ++ Seq(col("e.lag"), col("e.n_pairs"), col("e.acf")): _*)
  }

  /** Residual anomaly scoring on top of [[decompose]]: a robust
    * modified z (Iglewicz-Hoaglin, exact median/MAD — the
    * [[Scorer.robustZLast]] statistic) over the RESIDUAL component
    * instead of the raw value, so a point is judged against "what's
    * left after trend and seasonality" — a Monday spike on a
    * weekly-seasonal series stops masking a genuine outlier, and a
    * rising trend stops flagging every recent point.
    *
    * Edge rows where the centered trend window is incomplete have no
    * residual and emit NULL score / false flag — explicitly
    * undecidable, not silently dropped. MAD-zero series (constant
    * residuals) likewise score NULL: no scale, no verdict.
    *
    * Same scale shape as the pieces it composes: the decompose
    * windows plus two tiny per-series aggregations broadcast back.
    */
  def residualScore(
      series: DataFrame,
      seriesCols: Seq[String],
      period: Int,
      tsCol: String = "ts",
      valueCol: String = "value",
      zThreshold: Double = 3.5
  ): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    val keys = seriesCols.map(col)
    val dec = decompose(series, seriesCols, period, tsCol, valueCol)
    val med = dec
      .where(col("resid").isNotNull)
      .groupBy(keys: _*)
      .agg(percentile(col("resid"), lit(0.5)).as("_med"))
    val mad = dec
      .where(col("resid").isNotNull)
      .join(broadcast(med), seriesCols)
      .groupBy(keys: _*)
      .agg(percentile(abs(col("resid") - col("_med")), lit(0.5)).as("_mad"))
    val z = lit(0.6745) * (col("resid") - col("_med")) / col("_mad")
    dec
      .join(broadcast(med), seriesCols, "left")
      .join(broadcast(mad), seriesCols, "left")
      .withColumn(
        "score",
        when(col("resid").isNotNull && col("_mad") > 0, round6(z))
      )
      .withColumn(
        "is_anomaly",
        coalesce(abs(col("score")) > zThreshold, lit(false))
      )
      .drop("_med", "_mad")
  }
}
