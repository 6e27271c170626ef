package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming embedding drift (SURVEY §2.5 companion to
  * [[graft.similarity.Similarity.centroidShift]]): watch a corpus
  * ingest stream's per-group semantic centers move against a pinned
  * reference — the always-on version of the snapshot-vs-snapshot
  * assessment in [[graft.service.Service.assessEmbeddingDrift]].
  *
  * Split the same way as every streaming operator here: the part that
  * must be incremental (per-window per-group per-dimension centroid
  * partials) is ONE watermarked streaming aggregation with bounded
  * state (|groups| x dim x open windows); the L2 reduction over
  * dimensions would be a second chained aggregation — unsupported in
  * streaming — and is a trivial batch epilogue over the emitted
  * partials ([[shiftAgainst]], run it in foreachBatch or over the
  * sink table).
  */
object StreamingDrift {

  /** Per-window per-group centroid partials of a streaming corpus:
    * `(ts, key, pos, centroid, n)`. DECIMAL sums keep the means exact
    * and order-independent, so a replayed stream lands on identical
    * centroids. Append-mode compatible; rows emit once the watermark
    * passes each window.
    */
  def centroidPartials(
      df: DataFrame,
      vecCol: String,
      keyCol: String,
      tsColumn: String,
      windowDuration: String = "1 day",
      watermark: String = "1 hour"
  ): DataFrame =
    df.withWatermark(tsColumn, watermark)
      .select(col(tsColumn), col(keyCol).as("key"), posexplode(col(vecCol)))
      .groupBy(window(col(tsColumn), windowDuration), col("key"), col("pos"))
      .agg(
        sum(col("col").cast("double").cast(DecimalType(38, 10))).as("_s"),
        count(lit(1)).as("n")
      )
      .select(
        col("window.start").as("ts"),
        col("key"),
        col("pos"),
        graft.functions.round6(col("_s").cast("double") / col("n")).as("centroid"),
        col("n")
      )

  /** Batch epilogue: per-(window, group) L2 shift of emitted
    * [[centroidPartials]] against a static reference centroid table
    * ([[graft.similarity.Similarity.centroids]] output). Same
    * arithmetic and NULL-shift semantics as `centroidShift`: a
    * reference group absent from a window (or vice versa) surfaces
    * with a NULL shift. The reference is replicated per emitted
    * window via a crossJoin of two tiny frames (|windows| x |groups|
    * x dim rows) so vanished groups appear in EVERY window they are
    * missing from.
    */
  def shiftAgainst(partials: DataFrame, reference: DataFrame): DataFrame = {
    // both join sides derive from `partials` (the window list and the
    // current centroids) — alias every column so the full-outer join
    // sees fresh attribute ids instead of conflicting self-references
    val wins = partials.select(col("ts").as("w_ts")).distinct()
    val refGrid = wins.crossJoin(
      reference.select(
        col("key").as("r_key"),
        col("pos").as("r_pos"),
        col("centroid").as("_ca"),
        col("n").as("n_a")
      )
    )
    val cur = partials.select(
      col("ts").as("c_ts"),
      col("key").as("c_key"),
      col("pos").as("c_pos"),
      col("centroid").as("_cb"),
      col("n").as("n_b")
    )
    refGrid
      .join(
        cur,
        col("w_ts") === col("c_ts") && col("r_key") === col("c_key") &&
          col("r_pos") === col("c_pos"),
        "full_outer"
      )
      .groupBy(
        coalesce(col("w_ts"), col("c_ts")).as("ts"),
        coalesce(col("r_key"), col("c_key")).as("key")
      )
      .agg(
        count(lit(1)).as("dim"),
        graft.functions
          .round6(sqrt(sum((col("_ca") - col("_cb")) * (col("_ca") - col("_cb")))))
          .as("shift"),
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b")
      )
  }
}
