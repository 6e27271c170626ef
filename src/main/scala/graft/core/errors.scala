package graft.core

/** Typed error surface (reference: thoth raises ThothServiceError /
  * OptimizationFailedError — service_layer.py:16, optimization.py).
  *
  * graft's distributed default is to FLAG rather than throw (the
  * `optimization_failed` column — one bad series must not kill a
  * 10^5-series job), but the service boundary still offers the
  * reference's typed failures for callers that want hard stops.
  */
class GraftException(msg: String) extends RuntimeException(msg)

/** Scoring/assessing a dataset that was never optimized. */
class UnoptimizedDatasetException(val datasetUri: String)
    extends GraftException(
      s"No optimization stored for $datasetUri — run optimize() first"
    )

/** Strict-mode optimize: at least one series could not be optimized. */
class OptimizationFailedException(val datasetUri: String, val series: Seq[String])
    extends GraftException(
      s"Optimization failed for ${series.size} series of $datasetUri: " +
        series.take(10).mkString(", ") +
        (if (series.size > 10) ", ..." else "")
    )
