package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A metric whose score exceeded its optimized threshold
  * (reference: thoth/quality.py:12-18).
  */
case class AnomalousScore(
    entity: String,
    instance: String,
    name: String,
    score: Double,
    threshold: Double,
    // the statistic behind this alert was computed on a deterministically
    // thinned series (Service.assessTrend over >maxPoints history): the
    // verdict is an approximation and the payload must say so
    thinned: Boolean = false
)

/** Notification hook for anomalous batches
  * (reference: thoth/quality.py:21-81).
  */
trait NotificationHandler {
  def notify(datasetUri: String, ts: java.sql.Timestamp, anomalous: Seq[AnomalousScore]): Unit
}

/** Default handler: log to stderr (reference LogHandler). */
object LogHandler extends NotificationHandler {
  def notify(datasetUri: String, ts: java.sql.Timestamp, anomalous: Seq[AnomalousScore]): Unit =
    System.err.println(
      s"[graft.quality] Anomaly detected for ts=$ts on dataset=$datasetUri: $anomalous"
    )
}

/** Quality assessment: join scores against optimized thresholds and
  * flag exceedances (reference: thoth/quality.py:84-113).
  */
object Quality {

  /** Per-series assessment rows: seriesCols*, score, threshold,
    * is_anomalous. Stays fully distributed; callers collect only the
    * (tiny) anomalous subset for notification.
    *
    * A NULL score means the point could not be scored at all — the
    * metric collapsed below the APE's 1e-4 validity floor (e.g. a
    * pipeline breaking a mean from 100 to ~0) or the model had no
    * forecast. That is itself an alarm condition: NULL flags as
    * anomalous rather than silently vanishing from `where(is_anomalous)`
    * filters (the reference raises an error on the same condition).
    */
  def assess(
      scoring: DataFrame,
      optimization: DataFrame,
      seriesCols: Seq[String]
  ): DataFrame =
    scoring
      .join(
        broadcast(optimization.select((seriesCols.map(col) :+ col("threshold")): _*)),
        seriesCols
      )
      .withColumn(
        "is_anomalous",
        coalesce(col("score") > col("threshold"), lit(true))
      )
}
