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

  /** Append stream of `(t, starts, ends, net_change)` per time bucket.
    * `grain` is a window duration string ("1 minute"); buckets emit
    * once the watermark passes their end.
    */
  def deltas(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      grain: String = "1 minute",
      delayThreshold: String = "0 seconds"
  ): DataFrame = {
    val s = intervals
      .select(col(startCol).cast("timestamp").as("t"), lit(1L).as("_d"))
    val e = intervals
      .select(col(endCol).cast("timestamp").as("t"), lit(-1L).as("_d"))
    s.unionAll(e)
      .withWatermark("t", delayThreshold)
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
