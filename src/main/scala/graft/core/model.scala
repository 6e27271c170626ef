package graft.core

import java.sql.Timestamp

/** Identity of a profiling metric.
  *
  * Mirrors the reference's metric key (thoth/profiler.py:138-156):
  * `entity` is "Column" or "Dataset", `instance` is the column name or
  * "*" for dataset-scoped metrics, `name` is the analyzer name.
  */
case class Metric(entity: String, instance: String, name: String)

/** A single profiled value for one metric at one timestamp partition. */
case class ProfilingValue(metric: Metric, value: Double)

/** One point of a metric time series (thoth/base.py:10-15). */
case class Point(ts: Timestamp, value: Double)

/** A metric series (thoth/base.py:18-26). */
case class TimeSeries(metric: Metric, points: Seq[Point])

/** Granularities for timestamp partitioning (thoth/profiler.py:222-234).
  *
  * The reference supports DAY only; graft adds HOUR/WEEK/MONTH since
  * they are free with `date_trunc`.
  */
object Granularity {
  val Hour = "HOUR"
  val Day = "DAY"
  val Week = "WEEK"
  val Month = "MONTH"

  /** date_trunc unit for a granularity key (case-insensitive). */
  def truncUnit(granularity: String): String = granularity.toUpperCase match {
    case Hour  => "hour"
    case Day   => "day"
    case Week  => "week"
    case Month => "month"
    case other => throw new IllegalArgumentException(s"Unknown granularity: $other")
  }
}

/** Dataset registration metadata (thoth/dataset.py:12-38). */
case class DatasetMeta(
    uri: String,
    tsColumn: String,
    columns: Seq[String],
    granularity: String,
    metrics: Seq[Metric]
)
