package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value-repair operators — the profiler detects distribution
  * problems ([[Drift]], outlier counts); these fix rows in place for
  * downstream consumers (reference scope: thoth profiles and alerts;
  * clipping is the standard remediation an analytics user applies
  * next).
  */
object Clean {

  /** Winsorize a numeric column per group: clip to the group's
    * [lo, hi] quantiles, appended as `<valueCol>_winsorized` alongside
    * the untouched original (callers keep the raw value for audit).
    *
    * Two-pass shape: one map-side-combinable quantile aggregation to a
    * |groups|-row bounds table (Spark's `percentile` partial state),
    * equi-joined back onto the facts — AQE broadcasts the bounds side
    * at any realistic group count, so the fact table is never
    * shuffled; clipping itself is a codegen'd `least`/`greatest`. The
    * exact `percentile` matches DuckDB's `quantile_cont` bit-for-bit,
    * so the oracle needs no rounding.
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      lo: Double = 0.05,
      hi: Double = 0.95
  ): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(0 <= lo && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    // NULL-SAFE group join (the qualityCut/mixtureTemperature rule): a
    // NULL group gets its own bounds row like any other group — plain
    // equality would silently DELETE every NULL-group row from the
    // output instead of winsorizing it
    val bounds = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        percentile(col(valueCol), lit(lo)).as("_w_lo"),
        percentile(col(valueCol), lit(hi)).as("_w_hi")
      )
      .select(groupCols.map(c => col(c).as(s"_wg_$c")) ++
        Seq(col("_w_lo"), col("_w_hi")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"_wg_$c")).reduce(_ && _)
    df.join(bounds, cond)
      .drop(groupCols.map(c => s"_wg_$c"): _*)
      .withColumn(
        s"${valueCol}_winsorized",
        // least/greatest SKIP nulls (both engines), which would clamp a
        // NULL value to the lo bound — propagate it explicitly instead
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("_w_lo")), col("_w_hi")))
      )
      .drop("_w_lo", "_w_hi")
  }
}
