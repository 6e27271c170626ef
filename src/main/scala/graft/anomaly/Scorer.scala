package graft.anomaly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed anomaly scoring of the newest timestamp per series.
  *
  * Reference (thoth/anomaly/scoring.py:54-99): per metric, train the
  * optimization-selected model on history-minus-last, forecast the last
  * point, APE-score it. graft does the same for every series in one
  * pass: forecasts for ALL rows come from the shared window
  * expressions, the last row per series is selected with the same
  * window rank, and the per-series best model is joined in (a join on
  * the tiny optimization table — broadcast).
  */
object Scorer {

  /** Score the last point of every series with its optimized model.
    *
    * @param series       long-format series (seriesCols*, ts, value)
    * @param optimization output of [[Optimizer.optimize]]
    * @return seriesCols*, ts, value, predicted, score
    */
  def score(
      series: DataFrame,
      optimization: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      cfg: Optimizer.Config = Optimizer.Config()
  ): DataFrame =
    scoreAll(series, optimization, seriesCols, tsCol, valueCol, cfg)
      .where(col("rn") === col("n"))
      .drop("rn", "n")

  /** Backfill scoring: every point of every series scored with its
    * optimized model (reference has no equivalent — its per-metric
    * loop makes history scoring prohibitive; here it is the same single
    * window pass as last-point scoring). Output keeps `rn`/`n` so
    * callers can slice.
    */
  def scoreAll(
      series: DataFrame,
      optimization: DataFrame,
      seriesCols: Seq[String],
      tsCol: String = "ts",
      valueCol: String = "value",
      cfg: Optimizer.Config = Optimizer.Config()
  ): DataFrame =
    Optimizer
      .forecastErrors(series, seriesCols, tsCol, valueCol, cfg)
      .join(
        broadcast(optimization.select((seriesCols.map(col) :+ col("best_model")): _*)),
        seriesCols
      )
      .where(col("model") === col("best_model"))
      .select(
        (seriesCols.map(col) :+ col(tsCol) :+ col("value") :+
          col("predicted") :+ col("error").as("score") :+ col("rn") :+ col("n")): _*
      )
}
