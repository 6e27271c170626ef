package graft.anomaly

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Error metrics (reference: thoth/anomaly/error_metrics.py:4-13). */
object ErrorMetrics {

  /** Absolute percentage error, clamped to 1.0.
    *
    * The reference raises for |true| < 1e-4 (APE undefined near zero);
    * graft yields NULL there instead — a null error simply drops out of
    * distributed mean/threshold aggregates, which is the correct
    * semantics for a data-parallel pipeline.
    */
  def ape(trueValue: Column, predicted: Column): Column =
    when(abs(trueValue) < lit(1e-4) || predicted.isNull, lit(null))
      .otherwise(least(abs(trueValue - predicted) / abs(trueValue), lit(1.0)))
}

/** A forecast model expressed as a window expression over an ordered
  * per-series frame.
  *
  * Reference models (thoth/anomaly/models.py) train driver-side on a
  * pandas frame per metric. graft models are Catalyst window
  * expressions: `forecast` returns the 1-step-ahead prediction for
  * every row of every series simultaneously, so "training" thousands of
  * (dataset x column x metric) series is a single window exchange —
  * no driver loop, no per-series job.
  */
trait ForecastModel extends Serializable {
  def name: String

  /** 1-step-ahead forecast for the current row, using only strictly
    * preceding rows of the ordered window `w`. NULL when the model has
    * insufficient history at this row.
    */
  def forecast(value: Column, w: WindowSpec): Column
}

/** Trailing-mean forecast over a fixed window length (the reference's
  * SimpleModel candidate, thoth/anomaly/models.py:78-164: value(t) ~
  * mean(value(t-window .. t-1)), NULL unless the full window exists).
  */
case class TrailingMean(window: Int) extends ForecastModel {
  val name = s"TrailingMean-$window"
  def forecast(value: Column, w: WindowSpec): Column = {
    val frame = w.rowsBetween(-window, -1)
    when(count(value).over(frame) === lit(window), avg(value).over(frame))
  }
}

/** Seasonal-naive forecast: value(t) ~ value(t - period). Replaces the
  * reference's AutoSarima/AutoProphet AutoML slots
  * (thoth/anomaly/models.py:184-241) with a deterministic, fully
  * distributed seasonal baseline.
  */
case class SeasonalNaive(period: Int) extends ForecastModel {
  val name = s"SeasonalNaive-$period"
  def forecast(value: Column, w: WindowSpec): Column = lag(value, period).over(w)
}

/** Finite-horizon exponentially weighted moving average: weights
  * alpha*(1-alpha)^(j-1) over the last `horizon` lags, renormalized
  * over the lags actually present. NULL when no history.
  */
case class Ewma(alpha: Double = 0.5, horizon: Int = 8) extends ForecastModel {
  val name = f"Ewma-$alpha%.2f-$horizon"
  def forecast(value: Column, w: WindowSpec): Column = {
    val terms = (1 to horizon).map { j =>
      val weight = alpha * math.pow(1 - alpha, j - 1)
      val lagged = lag(value, j).over(w)
      (
        when(lagged.isNotNull, lagged * lit(weight)).otherwise(lit(0.0)),
        when(lagged.isNotNull, lit(weight)).otherwise(lit(0.0))
      )
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    when(den > lit(0.0), num / den)
  }
}

/** Finite-horizon Holt linear trend: forecast = level + trend, where
  * level is the EWMA of the last `horizon` values and trend the EWMA of
  * their first differences (each renormalized over present lags). Fills
  * the trend-aware slot of the reference's AutoML family with a
  * deterministic window expression — on drifting series trailing means
  * systematically lag, Holt does not.
  */
case class HoltLinear(alpha: Double = 0.5, beta: Double = 0.5, horizon: Int = 8)
    extends ForecastModel {
  val name = f"HoltLinear-$alpha%.2f-$beta%.2f-$horizon"
  def forecast(value: Column, w: WindowSpec): Column = {
    // level = EWMA of lagged values; on a sloped series that estimate
    // sits meanLag steps behind the next point, so the forecast
    // projects trend * meanLag forward (exact on a pure linear trend).
    val levelTerms = (1 to horizon).map { j =>
      val weight = alpha * math.pow(1 - alpha, j - 1)
      val lagged = lag(value, j).over(w)
      (
        when(lagged.isNotNull, lagged * lit(weight)).otherwise(lit(0.0)),
        when(lagged.isNotNull, lit(weight)).otherwise(lit(0.0)),
        when(lagged.isNotNull, lit(weight * j)).otherwise(lit(0.0))
      )
    }
    val levelDen = levelTerms.map(_._2).reduce(_ + _)
    val level = levelTerms.map(_._1).reduce(_ + _) / levelDen
    val meanLag = levelTerms.map(_._3).reduce(_ + _) / levelDen
    val trendTerms = (1 to horizon).map { j =>
      val weight = beta * math.pow(1 - beta, j - 1)
      val d = lag(value, j).over(w) - lag(value, j + 1).over(w)
      (
        when(d.isNotNull, d * lit(weight)).otherwise(lit(0.0)),
        when(d.isNotNull, lit(weight)).otherwise(lit(0.0))
      )
    }
    val trendDen = trendTerms.map(_._2).reduce(_ + _)
    val trend = trendTerms.map(_._1).reduce(_ + _) / trendDen
    when(levelDen > lit(0.0), level + when(trendDen > lit(0.0), trend * meanLag).otherwise(lit(0.0)))
  }
}

/** Learned-seasonality forecast: fills the reference's AutoML slot
  * (AutoSarima/AutoProphet, thoth/anomaly/models.py:184-241) with a
  * model that LEARNS its seasonality period per series — as a pure
  * window expression, so "fitting" 10^5 series is still one window
  * exchange, no per-series driver training.
  *
  * Per row: each candidate period p is scored by the mean absolute
  * seasonal difference over the last `h` steps,
  * score(p) = mean_{j=1..h} |value(t-j) - value(t-j-p)| — the
  * discrete analog of picking the autocorrelation-maximizing lag; the
  * lowest score wins (ties -> earlier candidate). Forecast =
  * value(t-p*) + drift*p*, where drift is the mean first difference
  * over the last h steps ((value(t-1) - value(t-h-1))/h, telescoped) —
  * so a series with seasonality AND linear trend is forecast exactly,
  * where plain SeasonalNaive lags by slope*period. NULL until
  * h + max(candidates) points of history exist.
  */
case class AutoSeasonal(candidates: Seq[Int] = Seq(7, 14), h: Int = 7)
    extends ForecastModel {
  require(candidates.nonEmpty && candidates.forall(_ > 0) && h > 0)
  val name = s"AutoSeasonal-${candidates.mkString("_")}-$h"
  def forecast(value: Column, w: WindowSpec): Column = {
    val need = h + candidates.max
    def lagv(j: Int) = lag(value, j).over(w)
    val haveAll = count(value).over(w.rowsBetween(-need, -1)) === lit(need)
    val drift = (lagv(1) - lagv(h + 1)) / h
    val scores = candidates.map { p =>
      p -> (1 to h).map(j => abs(lagv(j) - lagv(j + p))).reduce(_ + _) / h
    }
    // argmin with first-candidate tie preference: candidate i wins when
    // its score is <= every later candidate's score
    val pick = scores.zipWithIndex.foldRight(lit(null).cast("double")) {
      case (((p, s), i), elseCol) =>
        val cond = scores
          .drop(i + 1)
          .map(_._2)
          .foldLeft(lit(true))((acc, s2) => acc && s <= s2)
        when(cond, lagv(p) + drift * p).otherwise(elseCol)
    }
    when(haveAll, pick)
  }
}

/** Model factory (reference: thoth/anomaly/models.py:244-277). */
object Models {
  /** The reference SimpleModel's candidate windows. */
  val defaultWindows: Seq[Int] = Seq(3, 5, 7, 30)

  def trailingMeans(windows: Seq[Int] = defaultWindows): Seq[ForecastModel] =
    windows.map(TrailingMean)

  /** Default family: trailing means + seasonal-naive + EWMA. */
  def default: Seq[ForecastModel] =
    trailingMeans() ++ Seq(SeasonalNaive(7), Ewma())

  /** Extended family: default + trend-aware Holt + learned-period
    * seasonal (the AutoML slot).
    */
  def extended: Seq[ForecastModel] = default ++ Seq(HoltLinear(), AutoSeasonal())

  /** Simple family (reference SimpleModelFactory): trailing means only. */
  def simple: Seq[ForecastModel] = trailingMeans()
}
