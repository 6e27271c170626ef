package graft.streaming

import graft.dedup.Dedup
import graft.text.Text
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  OutputMode,
  StatefulProcessor,
  TimeMode,
  TimerValues,
  TTLConfig,
  ValueState
}

/** Streaming MinHash-LSH NEAR-duplicate detection (SURVEY §2.4,
  * streaming face of [[graft.dedup.Dedup.nearDupSweep]]): annotate an
  * always-on document stream with the estimated Jaccard against the
  * most similar PRIOR document, so boilerplate variants and
  * re-crawls are flagged while the first arrival of each content
  * family passes.
  *
  * Shape — the batch pipeline's stages, re-expressed with managed
  * state:
  *   - signatures + band keys are the same scan-side codegen'd
  *     expressions the batch family uses (`TokenHashes` →
  *     `ShingleHashes` → `MinHashSignature` → band hash) — nothing
  *     stateful until the band shuffle;
  *   - stage 1 (state keyed by band bucket): the first arrival in a
  *     bucket becomes the bucket's ROOT and its signature
  *     (numHashes × 8 B) is the only stored payload; every later
  *     arrival is scored against the root — the streaming analogue of
  *     [[graft.dedup.BucketJoin]]'s star: candidates pair with the
  *     bucket root, never with each other, so state and output stay
  *     O(1) per bucket per doc;
  *   - stage 2 (keyed by doc id, stateless): a document's verdicts
  *     from all its `bands` buckets arrive in the same micro-batch
  *     (they exploded from one input row), so the per-doc max reduces
  *     immediately — no windowed aggregation, no watermark delay on
  *     results.
  *
  * Chaining two stateful operators requires declaring the event-time
  * column of each stage's OUTPUT — the Spark 4 `transformWithState`
  * contract (the classic flatMapGroupsWithState chain trips the
  * global-watermark correctness check). It also requires the RocksDB
  * state store provider:
  * `spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
  *
  * Root lifetime is EVENT-TIME bounded by `horizon` (an event-time
  * timer clears the bucket state once the watermark passes root ts +
  * horizon) — state size tracks the distinct-band rate within the
  * horizon, not stream history, the same contract as
  * [[StreamingDedup]]. A root expiring mid-family lets the next
  * arrival re-root (one unflagged doc per family per horizon — the
  * TTL recall trade every watermarked dedup makes).
  *
  * Caveats vs batch: scoring is against the bucket ROOT only (the
  * batch sweep's star semantics — near-identical families estimate
  * high against their root; chains of gradual mutations may escape);
  * documents producing no shingles (shorter than `shingleN` tokens)
  * emit nothing — union them back as trivially-kept upstream if they
  * matter.
  */
object StreamingNearDup {

  /** One exploded (doc, band bucket) arrival. */
  case class BandRow(doc_id: Long, ts: java.sql.Timestamp, bucket: Long, sig: Array[Long])

  /** Stage-1 output: this doc's estimated Jaccard vs one bucket root
    * (0.0 when the doc IS the root).
    */
  case class BandVerdict(doc_id: Long, ts: java.sql.Timestamp, est: Double)

  /** Final annotation: max estimate over the doc's buckets. */
  case class Verdict(doc_id: Long, ts: java.sql.Timestamp, max_est: Double, near_dup: Boolean)

  /** Stage-1 state payload (public: the state encoder's generated
    * code must reach the constructor — a private case class forces a
    * per-row interpreted fallback).
    */
  case class RootSig(sig: Array[Long])

  /** Stage 1: per band-bucket, root-and-score with event-time expiry. */
  private class BandRootProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, BandRow, BandVerdict] {
    @transient private var root: ValueState[RootSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      root = getHandle.getValueState[RootSig]("rootSig", Encoders.product[RootSig], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[BandRow],
        timers: TimerValues
    ): Iterator[BandVerdict] = {
      // arrival order within a batch is not defined; (ts, id) makes
      // the root choice deterministic — same tie rule as the batch
      // sweep's min-id canonical slot
      val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
      val out = Array.newBuilder[BandVerdict]
      sorted.foreach { r =>
        if (!root.exists()) {
          root.update(RootSig(r.sig))
          getHandle.registerTimer(r.ts.getTime + horizonMs)
          out += BandVerdict(r.doc_id, r.ts, 0.0)
        } else {
          val rs = root.get().sig
          var eq = 0
          var i = 0
          val n = math.min(rs.length, r.sig.length)
          while (i < n) { if (rs(i) == r.sig(i)) eq += 1; i += 1 }
          out += BandVerdict(r.doc_id, r.ts, if (n == 0) 0.0 else eq.toDouble / n)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timers: TimerValues,
        info: ExpiredTimerInfo
    ): Iterator[BandVerdict] = {
      root.clear()
      Iterator.empty
    }
  }

  /** Stage 2: per doc, max over its band verdicts — stateless (all of
    * a doc's verdicts arrive in the micro-batch its row exploded in).
    */
  private class DocMaxProcessor(threshold: Double)
      extends StatefulProcessor[Long, BandVerdict, Verdict] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(
        key: Long,
        rows: Iterator[BandVerdict],
        timers: TimerValues
    ): Iterator[Verdict] = {
      val rs = rows.toArray
      val maxEst = rs.iterator.map(_.est).max
      Iterator.single(Verdict(key, rs.head.ts, maxEst, maxEst >= threshold))
    }
  }

  /** Annotate a streaming document frame with near-dup verdicts.
    *
    * @param df        streaming input
    * @param textCol   document text
    * @param idCol     LONG document id (cast upstream)
    * @param tsCol     event-time column
    * @param watermark allowed lateness, e.g. "10 minutes"
    * @param horizon   EVENT-TIME lifetime of a bucket root, e.g.
    *                  Duration.ofHours(1): how long new arrivals are
    *                  scored against it
    * @param threshold estimated Jaccard at or above which a doc is
    *                  flagged `near_dup`
    */
  def nearDup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tsCol: String,
      watermark: String,
      horizon: java.time.Duration,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5
  ): Dataset[Verdict] = {
    require(
      bands > 0 && numHashes % bands == 0 && numHashes / bands > 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)"
    )
    require(threshold > 0.0 && threshold <= 1.0, s"threshold out of (0,1]: $threshold")
    require(!horizon.isNegative && !horizon.isZero, s"horizon must be positive: $horizon")
    val spark = df.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val banded = df
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(tsCol).cast("timestamp").as("ts"),
        Text.shingleHashesFromTokenHashes(Text.tokenHashes(col(textCol)), shingleN).as("_sh")
      )
      .where(size(col("_sh")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("_sh"), numHashes))
      .select(
        col("doc_id"),
        col("ts"),
        explode(Dedup.bandHashes(col("sig"), bands, rowsPerBand)).as("bh"),
        col("sig")
      )
      .select(col("doc_id"), col("ts"), col("bh.bucket").as("bucket"), col("sig"))
      .withWatermark("ts", watermark)
      .as[BandRow]
    banded
      .groupByKey(_.bucket)
      .transformWithState(new BandRootProcessor(horizon.toMillis), "ts", OutputMode.Append())
      .groupByKey(_.doc_id)
      .transformWithState(new DocMaxProcessor(threshold), "ts", OutputMode.Append())
  }
}
