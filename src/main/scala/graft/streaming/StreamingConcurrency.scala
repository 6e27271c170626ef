package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming sweep-line concurrency — the batch
  * [[graft.operators.EventAnalytics.concurrencyProfile]] semantics on
  * an always-on stream of COMPLETED intervals (the sessionizer's
  * output, job records, connection logs).
  *
  * The per-bucket deltas are a pure watermarked windowed aggregation:
  * each interval contributes +1 at its start bucket and −1 at its end
  * bucket (a self-union of two scan projections), reduced by the
  * engine's windowed-state machinery — O(open windows) state, closed
  * buckets emitted append-mode exactly once. The RUNNING sum across
  * buckets is a cross-window chain a streaming agg cannot express
  * (same boundary as [[StreamingDrift]]'s shift step): run
  * [[concurrencyFromDeltas]] as the foreachBatch/sink-side epilogue
  * over the accumulated bucket table — bucket-grain rows,
  * calendar-bounded, trivially cheap next to the stream itself.
  *
  * Streamed buckets EQUAL the batch profile's on the same data
  * (spec-pinned), so the epilogue reproduces the full concurrency
  * timeline exactly.
  */
object StreamingConcurrency {

  /** Sum of two duration strings as a watermark-safe threshold string.
    * Month-based units are refused — a month has no fixed length, so
    * it cannot bound lateness.
    */
  private def addDurations(a: String, b: String): String = {
    import org.apache.spark.sql.catalyst.util.IntervalUtils
    import org.apache.spark.unsafe.types.UTF8String
    val ia = IntervalUtils.stringToInterval(UTF8String.fromString(a))
    val ib = IntervalUtils.stringToInterval(UTF8String.fromString(b))
    require(
      ia.months == 0 && ib.months == 0,
      s"month-based durations cannot bound watermark lateness: '$a' + '$b'"
    )
    s"${ia.days + ib.days} days ${ia.microseconds + ib.microseconds} microseconds"
  }

  /** Append stream of `(t, starts, ends, net_change)` per time bucket.
    * `grain` is a window duration string ("1 minute"); buckets emit
    * once the watermark passes their end.
    *
    * `maxIntervalDuration` is LOAD-BEARING: both the +1 (start) and −1
    * (end) rows ride one watermark column, and a completed interval's
    * start time lags its end time by the interval's length — so the
    * effective watermark delay is `delayThreshold + maxIntervalDuration`,
    * or steady-state end events would advance the watermark past their
    * OWN interval's start row and the running concurrency would drift
    * negative forever. An interval longer than the declared maximum
    * fails loudly at scan time instead of silently corrupting state.
    */
  def deltas(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      maxIntervalDuration: String,
      grain: String = "1 minute",
      delayThreshold: String = "0 seconds"
  ): DataFrame = {
    val overLong = col(endCol).cast("timestamp") >
      col(startCol).cast("timestamp") + expr(s"INTERVAL $maxIntervalDuration")
    val guarded = intervals.select(
      when(
        overLong,
        raise_error(format_string(
          s"StreamingConcurrency.deltas: interval [%s, %s] exceeds " +
            s"maxIntervalDuration '$maxIntervalDuration' — its start row " +
            "would be dropped as late and concurrency would corrupt",
          col(startCol).cast("string"),
          col(endCol).cast("string")
        ))
      ).otherwise(col(startCol).cast("timestamp")).as("_s"),
      col(endCol).cast("timestamp").as("_e")
    )
    val s = guarded.select(col("_s").as("t"), lit(1L).as("_d"))
    val e = guarded.select(col("_e").as("t"), lit(-1L).as("_d"))
    s.unionAll(e)
      .withWatermark("t", addDurations(delayThreshold, maxIntervalDuration))
      .groupBy(window(col("t"), grain).as("_w"))
      .agg(
        sum(when(col("_d") > 0, 1L).otherwise(0L)).as("starts"),
        sum(when(col("_d") < 0, 1L).otherwise(0L)).as("ends"),
        sum(col("_d")).as("net_change")
      )
      .select(col("_w.start").as("t"), col("starts"), col("ends"), col("net_change"))
  }

  /** Batch epilogue: running concurrency over an accumulated delta
    * table (output of [[deltas]], any number of micro-batches).
    * Bucket-grain window — never sees raw intervals.
    */
  def concurrencyFromDeltas(deltaTable: DataFrame): DataFrame = {
    val w = Window
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltaTable.withColumn("concurrent", sum(col("net_change")).over(w))
  }
}
