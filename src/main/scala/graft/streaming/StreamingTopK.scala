package graft.streaming

import graft.profiler.HeavyHitters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming windowed heavy hitters (SURVEY §2.1 #14k's streaming
  * twin): the Misra-Gries sketch as a watermarked windowed
  * aggregation, for "top terms / top keys right now" over an unbounded
  * stream.
  *
  * The MG aggregator is mergeable ([[HeavyHitters.MisraGries.merge]]
  * is exactly what Structured Streaming's incremental state update
  * calls), so state is <= k-1 counters per open window — O(k) bytes
  * regardless of stream rate — and the append-mode result for a window
  * equals the batch sketch over the same rows once the watermark
  * closes it. Same exactness contract as batch: when a window's
  * distinct-key count stays under k, counts are exact; beyond that,
  * standard MG undercount bounds apply.
  */
object StreamingTopK {

  /** Per-window MG counters: `(window_start, window_end, counters)`,
    * append-mode compatible (emits when the watermark passes the
    * window end).
    */
  def windowedHeavyHitters(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      k: Int = 10,
      windowDuration: String = "1 day",
      watermark: String = "1 hour"
  ): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(HeavyHitters.sketch(k)(col(keyCol)).as("counters"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("counters")
      )

  /** Sink-side epilogue (foreachBatch or over the materialized table):
    * explode each window's counter map into ranked rows
    * `(window_start, key, est_count, rank)`, top `k` per window.
    */
  def ranked(counters: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy("window_start")
      .orderBy(col("est_count").desc, col("key"))
    counters
      .select(
        col("window_start"),
        explode(col("counters")).as(Seq("key", "est_count"))
      )
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
