package graft.streaming

import graft.text.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of [[graft.pipelines.Corpus.prepareFunnel]]: the
  * same first-failing-stage accounting on an always-on ingest stream.
  *
  * The scan-side stages (Gopher rules, language gate) are pure Column
  * arithmetic and stream untouched — the only batch construct the
  * funnel uses that streaming cannot is the canonical-slot
  * `row_number` window. Its streaming substitute is
  * `dropDuplicatesWithinWatermark` on the content fingerprint:
  * "duplicate" means "a surviving document with this fingerprint was
  * already seen within the watermark horizon", keeping FIRST-ARRIVAL
  * (the streaming analogue of the batch lowest-id rule; at-least-once
  * sinks re-deliver rather than re-admit).
  *
  * State is one 8-byte entry per distinct fingerprint of rule-PASSING
  * docs within the watermark — rule-failed docs are tagged before the
  * dedup operator and never enter the state store, mirroring the
  * batch funnel's failed-rows-ordered-last rule (a dropped
  * boilerplate page cannot claim a fingerprint's canonical slot).
  */
object StreamingFunnel {

  /** Annotate a stream with `predicted`, `drop_reason`, `kept`.
    *
    * Output contract matches the batch funnel, with one structural
    * difference: rows dropped by the dedup stage are NOT emitted
    * (streaming dedup suppresses duplicates; it cannot tag them), so
    * the output is the per-row audit of rule stages plus the
    * deduplicated survivors. Funnel accounting on a stream therefore
    * reads `drop_reason` for rule losses and infers duplicate volume
    * from input-minus-output counts.
    */
  def prepare(
      df: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String,
      keepLang: String = "en"
  ): DataFrame = {
    val tagged = df
      .withColumn("_toks", Text.tokens(col(textCol)))
      .withColumn("predicted", Text.langIdFromTokens(col("_toks")))
      .withColumn(
        "_gopher",
        Text.gopherReasonFromTokens(col(textCol), col("_toks"))
      )
      .withColumn(
        "drop_reason",
        coalesce(
          when(col("_gopher") =!= "ok", col("_gopher")),
          when(col("predicted") =!= keepLang, lit("non_english")),
          lit("kept")
        )
      )
      .withColumn("kept", col("drop_reason") === "kept")
      .drop("_toks", "_gopher")
    // only rule-passing rows enter dedup state; failed rows pass
    // through tagged (union of two filtered branches of the SAME
    // streaming source stays a single-scan plan)
    val survivors = tagged
      .where(col("kept"))
      .withColumn("_fp", xxhash64(Text.normalize(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
    val failed = tagged.where(!col("kept"))
    survivors.unionByName(failed)
  }
}
