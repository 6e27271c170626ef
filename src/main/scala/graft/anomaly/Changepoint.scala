package graft.anomaly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Changepoint detection over metric series (SURVEY §2.2).
  *
  * Two-sided standardized CUSUM (Page 1954): the forecast models catch
  * point anomalies; CUSUM accumulates SMALL persistent shifts — a mean
  * that drifts by half a sigma never trips a per-point threshold but
  * integrates to an alarm within a few observations.
  */
object Changepoint {

  import graft.functions.round6

  /** Two-sided CUSUM over `(seriesCols..., tsCol, valueCol)` rows.
    *
    * The recursion s+_t = max(0, s+_{t-1} + z_t - slack) is evaluated
    * in closed form as a running drawdown — C_t - min(0, min_j<=t C_j)
    * over the cumulative sum C of (z - slack) — so the whole operator
    * is two ordered-window passes per series, NO driver loop and no
    * sequential fold, and parallelizes across series like every other
    * window model here.
    *
    * Determinism: per-series mean/std come from DECIMAL(38,10) sums
    * (order-independent, identical in DuckDB), z and the cumulative
    * sums are pointwise/ordered IEEE ops, and the reported statistics
    * are rounded to 6 dp with the alarm compared on the ROUNDED value
    * — bit-identical on any engine. A zero-variance series emits z = 0
    * (no scale to standardize against, and certainly no shift).
    *
    * Output: input columns + `z`, `cusum_pos`, `cusum_neg`, `alarm`
    * (threshold exceeded in either direction, in sigma units).
    */
  def cusum(
      series: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      slack: Double = 0.5,
      threshold: Double = 4.0
  ): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val keys = seriesCols.map(col)
    val stats = series
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast(DecimalType(38, 10))).as("_dsx"),
        sum((col(valueCol) * col(valueCol)).cast(DecimalType(38, 10)))
          .as("_dsx2")
      )
      .withColumn("_mean", col("_dsx").cast("double") / col("_n"))
      .withColumn(
        "_std",
        when(col("_n") > 1,
          sqrt(
            (col("_dsx2").cast("double") - col("_n") * col("_mean") * col("_mean"))
              / (col("_n") - 1)
          )
        ).otherwise(lit(0.0))
      )
      .select(keys :+ col("_mean") :+ col("_std"): _*)
    val w = Window
      .partitionBy(keys: _*)
      .orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .join(broadcast(stats), seriesCols)
      .withColumn(
        "z",
        when(col("_std") > 0, (col(valueCol) - col("_mean")) / col("_std"))
          .otherwise(lit(0.0))
      )
      .withColumn("_cp", sum(col("z") - lit(slack)).over(w))
      .withColumn("_cn", sum(-col("z") - lit(slack)).over(w))
      .withColumn("cusum_pos", round6(col("_cp") - least(min(col("_cp")).over(w), lit(0.0))))
      .withColumn("cusum_neg", round6(col("_cn") - least(min(col("_cn")).over(w), lit(0.0))))
      .withColumn("z", round6(col("z")))
      .withColumn(
        "alarm",
        col("cusum_pos") > threshold || col("cusum_neg") > threshold
      )
      .drop("_mean", "_std", "_cp", "_cn")
  }
}
