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
        sum(col("_v").cast(DecimalType(38, 6))).as("sum"),
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
