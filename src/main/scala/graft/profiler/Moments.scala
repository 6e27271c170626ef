package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable moment sketches: profile once at fine grain, re-aggregate
  * to any coarser grain WITHOUT rescanning the raw table.
  *
  * At 100 TB the raw scan is the dominant cost; a monitoring platform
  * that wants daily AND weekly AND monthly profiles must not pay it
  * three times. Count / sum / sum-of-squares / min / max are exactly
  * mergeable, so the daily partials stored in the metrics repository
  * ARE the input for every coarser grain — a re-aggregation job runs
  * over days × columns rows, not the corpus.
  *
  * Sums are carried as DECIMAL (exact, order-independent), which makes
  * the merge EXACT: reaggregate(partials(day)) is bit-identical to
  * partials(month) computed directly — asserted by the oracle and the
  * spec, not just approximately true. Per-row squares are computed in
  * double (one deterministic multiplication) and then fixed to
  * DECIMAL(38,12) for the order-independent sum.
  */
object Moments {

  private def unit(granularity: String) = graft.core.Granularity.truncUnit(granularity)

  /** Per-(bucket, column) mergeable partials:
    * `(ts, instance, n, sum, sumsq, min, max)`.
    */
  def partials(
      df: DataFrame,
      tsColumn: String,
      valueCols: Seq[String],
      granularity: String = "day"
  ): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    df.unpivot(
        Array(date_trunc(unit(granularity), col(tsColumn)).as("ts")),
        valueCols.map(col).toArray,
        "instance",
        "_v"
      )
      .groupBy("ts", "instance")
      .agg(
        count(col("_v")).as("n"),
        // scale 12, not 6: the per-row cast QUANTIZES each value before
        // summing, and a column of sub-1e-6 magnitudes (rates, deltas)
        // would sum to an exact 0 — means wrong by 100% while still
        // "bit-identically mergeable". 1e-12 per-row granularity keeps
        // 26 integer digits of headroom, same as sumsq.
        sum(col("_v").cast(DecimalType(38, 12))).as("sum"),
        sum((col("_v") * col("_v")).cast(DecimalType(38, 12))).as("sumsq"),
        min(col("_v")).as("min"),
        max(col("_v")).as("max")
      )
  }

  /** Merge partials into a coarser grain. Buckets must nest (hour→day/
    * week/month, day→week/month) — decimal sums make the merge exact.
    */
  def reaggregate(partials: DataFrame, granularity: String): DataFrame =
    partials
      .groupBy(date_trunc(unit(granularity), col("ts")).as("ts"), col("instance"))
      .agg(
        sum("n").cast("long").as("n"),
        sum("sum").as("sum"),
        sum("sumsq").as("sumsq"),
        min("min").as("min"),
        max("max").as("max")
      )

  /** Mergeable DISTINCT-COUNT partials: one HLL sketch per (bucket,
    * column) — the cardinality analogue of the moment partials. The
    * sketch binary is ~2^lgConfigK bytes per (day, column) regardless
    * of row count, so the metrics repository can persist it and any
    * coarser grain (week, month) re-aggregates by sketch UNION without
    * rescanning raw data — exactly what exact COUNT(DISTINCT) cannot
    * do (distinct counts don't add across days).
    *
    * `(ts, instance, n, sketch: binary)`.
    */
  def distinctPartials(
      df: DataFrame,
      tsColumn: String,
      valueCols: Seq[String],
      granularity: String = "day",
      lgConfigK: Int = 12
  ): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    df.unpivot(
        Array(date_trunc(unit(granularity), col(tsColumn)).as("ts")),
        valueCols.map(col(_).cast("string")).toArray,
        "instance",
        "_v"
      )
      .groupBy("ts", "instance")
      .agg(
        count(col("_v")).as("n"),
        hll_sketch_agg(col("_v"), lit(lgConfigK)).as("sketch")
      )
  }

  /** Merge distinct-count partials into a coarser grain and estimate:
    * `(ts, instance, n, approx_distinct)`. Union of the fine-grain
    * sketches — no raw rescan, no exact-distinct Expand exchange.
    */
  def reaggregateDistinct(partials: DataFrame, granularity: String): DataFrame =
    partials
      .groupBy(date_trunc(unit(granularity), col("ts")).as("ts"), col("instance"))
      .agg(
        sum("n").cast("long").as("n"),
        hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("approx_distinct")
      )

  /** Mergeable QUANTILE partials: per (bucket, column) an equi-probable
    * grid of `gridSize`+1 approximate quantiles (probs 0, 1/g, ...,
    * 1) plus the bucket count — the quantile analogue of the moment
    * partials, sized O(gridSize) per (day, column) regardless of row
    * count, so the metrics repository can persist them (array column)
    * and any coarser grain re-aggregates WITHOUT rescanning raw data.
    *
    * `(ts, instance, n, qgrid: array<double>)`. Buckets with no
    * non-null values carry a NULL grid (they merge as zero mass).
    */
  def quantilePartials(
      df: DataFrame,
      tsColumn: String,
      valueCols: Seq[String],
      granularity: String = "day",
      gridSize: Int = 128,
      accuracy: Int = 10000
  ): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    require(gridSize >= 2, s"gridSize must be >= 2, got $gridSize")
    val probs = array((0 to gridSize).map(i => lit(i.toDouble / gridSize)): _*)
    df.unpivot(
        Array(date_trunc(unit(granularity), col(tsColumn)).as("ts")),
        valueCols.map(col).toArray,
        "instance",
        "_v"
      )
      .groupBy("ts", "instance")
      .agg(
        count(col("_v")).as("n"),
        percentile_approx(col("_v"), probs, lit(accuracy)).as("qgrid")
      )
  }

  /** Merge quantile partials into a coarser grain: each grid point
    * stands for n/|grid| rows of its bucket, the coarse quantile is
    * the weighted quantile of the pooled points. Rank error is bounded
    * by ~1/gridSize of each source bucket's mass plus the
    * approx-percentile error — spec-verified against an exact
    * recompute. Output: `(ts, instance, q<p*100> ...)`.
    *
    * Scale shape: the pooled-point table is buckets x columns x
    * gridSize rows (metrics-sized, not data-sized); the window
    * partitions on (coarse bucket, column) — thousands of small
    * partitions, never a data-sized one.
    */
  def reaggregateQuantiles(
      partials: DataFrame,
      granularity: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75)
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1), s"bad probs: $probs")
    def nameOf(p: Double) = "q" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
    require(probs.map(nameOf).distinct.size == probs.size, s"probs collide in names: $probs")
    val pts = partials
      .where(col("qgrid").isNotNull)
      .select(
        date_trunc(unit(granularity), col("ts")).as("ts"),
        col("instance"),
        (col("n").cast("double") / size(col("qgrid"))).as("_w"),
        explode(col("qgrid")).as("_q")
      )
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("ts", "instance")
      .orderBy("_q")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("ts", "instance")
    val cum = pts
      .withColumn("_cw", sum(col("_w")).over(wOrd))
      .withColumn("_tw", sum(col("_w")).over(wAll))
    val aggs = probs.map(p => min(when(col("_cw") >= col("_tw") * p, col("_q"))).as(nameOf(p)))
    cum.groupBy("ts", "instance").agg(aggs.head, aggs.tail: _*)
  }

  /** Render partials as profile metrics:
    * `(ts, instance, n, mean, stddev, min, max)` — sample stddev from
    * the exact sums, NULL below 2 points.
    */
  def finalizeProfile(partials: DataFrame): DataFrame = {
    val s = col("sum").cast("double")
    val q = col("sumsq").cast("double")
    val n = col("n")
    partials.select(
      col("ts"),
      col("instance"),
      n,
      graft.functions.round6(s / n).as("mean"),
      when(
        n > 1,
        graft.functions.round6(sqrt(greatest((q - s * s / n) / (n - 1), lit(0.0))))
      ).as("stddev"),
      col("min"),
      col("max")
    )
  }
}
