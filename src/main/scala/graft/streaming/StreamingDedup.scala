package graft.streaming

import graft.text.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication (SURVEY §2.4, streaming face of
  * [[graft.dedup.Dedup.exact]]): drop any document whose
  * (canonicalized) content was already seen, with dedup state bounded
  * by the event-time watermark.
  *
  * Scale shape: state per distinct key is ONE 8-byte hash entry in the
  * state store (the text itself is never stored), expired once the
  * watermark passes — so an always-on ingest pipeline holds state
  * proportional to the distinct-content rate within the watermark
  * horizon, not the stream's history. Uses
  * `dropDuplicatesWithinWatermark`, Spark's purpose-built TTL'd dedup
  * operator.
  *
  * 64-bit caveat: unlike the batch operator (which verifies within
  * hash groups), a streaming dedup cannot re-compare texts against
  * already-expired rows; a 64-bit collision (P ~ n^2 / 2^64 within one
  * watermark window) drops a non-duplicate. Widen to a 128-bit key
  * (two seeded hashes) when the within-watermark volume warrants it.
  */
object StreamingDedup {

  /** Keep the first arrival of each distinct (canonicalized) text.
    *
    * @param df           streaming input
    * @param textCol      document text column
    * @param tsCol        event-time column
    * @param watermark    how long duplicate keys stay droppable /
    *                     how late events may arrive, e.g. "1 hour"
    * @param canonicalize optional normalization applied before hashing
    */
  def exact(
      df: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String,
      canonicalize: Column => Column = identity
  ): DataFrame =
    df.withColumn("_key", xxhash64(canonicalize(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_key")
      .drop("_key")

  /** Case/punctuation/whitespace-insensitive variant (streaming face
    * of [[graft.dedup.Dedup.exactNormalized]]).
    */
  def exactNormalized(
      df: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String
  ): DataFrame = exact(df, textCol, tsCol, watermark, Text.normalize)
}
