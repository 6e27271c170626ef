package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded within-bucket candidate generation — the shared back half
  * of every LSH / pigeonhole pair pipeline (MinHash bands, SimHash
  * chunks, perceptual-hash chunks; both the XXH64 and md5 families).
  *
  * The raw bucket self-join emits |bucket|^2 candidate rows per
  * bucket BEFORE any similarity filter runs. On boilerplate-heavy
  * web corpora one (band, bucket) key routinely collects thousands of
  * near-identical documents (license headers, templated pages), and a
  * million-doc boilerplate cluster would emit 10^12 rows from a
  * single task — AQE can split a skewed partition but cannot shrink
  * quadratic join output. `bucketCap` bounds this:
  *
  *  - buckets with <= bucketCap members pair exhaustively (exact,
  *    identical to the uncapped join);
  *  - HOT buckets (> bucketCap members) fall back to a STAR: every
  *    member pairs with the bucket's min-id member only — O(m) output
  *    instead of O(m^2). The similarity filter still applies per pair.
  *
  * The star keeps dedup semantics intact for the hot case: a bucket
  * only gets hot when many documents share a full band/chunk of the
  * signature, i.e. they are near-identical, so each member's pair
  * with the bucket root passes the similarity threshold and both
  * [[Dedup.nearDupSweep]] (root survives, members flagged) and
  * [[Dedup.componentSweep]] (star edges connect the whole cluster)
  * behave as if all pairs had been emitted — EXACTLY so for
  * identical-content clusters (spec-pinned). For NEAR-identical
  * variants the trade is larger than direct pair output: a member
  * whose noisy estimated similarity to the bucket root misses the
  * threshold also loses the member-member edges that would have
  * caught it, so the sweep can MISS a small fraction of duplicates.
  * Measured in BucketCapSpec's recall study (300 one-word-mutation
  * variants, cap 16, 16 hashes): direct-pair recall 6.5%, sweep left
  * +5 extra survivors (1.7% of the family) — one-sided (the cap never
  * over-deletes; capped survivors are a superset of exact survivors).
  * Size the cap a few multiples above the largest LEGITIMATE
  * near-dup family, not at the bench-friendly minimum. Set
  * bucketCap = 0 to disable (exact, unbounded).
  *
  * Cost shape: bucket stats come from one window over the same
  * (keys) partitioning the join itself needs, so the exchange is
  * reused across the small/hot branches; a hot bucket costs one
  * linear task, never a quadratic one.
  */
private[graft] object BucketJoin {

  /** Default hot-bucket cap for PIPELINE entry points
    * ([[graft.pipelines.Corpus.semanticDedupStage]],
    * [[graft.pipelines.Incremental.prepareBatch]]). The low-level pair
    * APIs stay exact-by-default (cap 0) — capping is an opt-in recall
    * trade, and for decontamination a false NEGATIVE is the costly
    * direction — but the "run this over a whole crawl" surfaces must
    * not inherit an unbounded |bucket|^2 blowup from a boilerplate
    * cluster the caller never saw. 4096 sits a few multiples above
    * any legitimate near-dup family (see the recall study above)
    * while bounding a hot bucket to ~4096·m candidate rows.
    */
  val PipelineDefaultCap = 4096

  /** Within-bucket self-pairs of `rows` (columns: keys..., `id`,
    * `sigCol`), id_a < id_b, bounded per bucket by `bucketCap`
    * (0 = unbounded). Output: id_a, id_b, _sa, _sb.
    */
  def selfPairs(
      rows: DataFrame,
      keys: Seq[String],
      sigCol: String,
      bucketCap: Int
  ): DataFrame = {
    def aSide(d: DataFrame) =
      d.select(keys.map(col) :+ col("id").as("id_a") :+ col(sigCol).as("_sa"): _*)
    def bSide(d: DataFrame) =
      d.select(keys.map(col) :+ col("id").as("id_b") :+ col(sigCol).as("_sb"): _*)
    def exhaustive(d: DataFrame) =
      aSide(d)
        .join(bSide(d), keys)
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
    if (bucketCap <= 0) exhaustive(rows)
    else {
      val w = Window.partitionBy(keys.map(col): _*)
      val ann = rows
        .withColumn("_bn", count(lit(1)).over(w))
        .withColumn("_bmin", min(col("id")).over(w))
      val smallPairs = exhaustive(ann.where(col("_bn") <= bucketCap).drop("_bn", "_bmin"))
      val hot = ann.where(col("_bn") > bucketCap)
      val starPairs = bSide(hot.where(col("id") =!= col("_bmin")))
        .join(aSide(hot.where(col("id") === col("_bmin"))), keys)
        .select("id_a", "id_b", "_sa", "_sb")
      smallPairs.unionByName(starPairs)
    }
  }

  /** Cross-corpus within-bucket pairs. Only the LEFT side is capped
    * (keep the `leftBucketCap` lowest ids per bucket, 0 = unbounded):
    * in the decontamination shape the left side is the benchmark set
    * and the semantic need is a per-RIGHT-doc contamination flag, so
    * every right row must survive — a hot bucket then compares each
    * right doc against at most `leftBucketCap` benchmark docs
    * (bounded linear output) instead of all of them. Output: id_l,
    * id_r, _sa, _sb.
    */
  def crossPairs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      sigCol: String,
      leftBucketCap: Int
  ): DataFrame = {
    val cappedLeft =
      if (leftBucketCap <= 0) left
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("id"))
        left
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") <= leftBucketCap)
          .drop("_rn")
      }
    cappedLeft
      .select(keys.map(col) :+ col("id").as("id_l") :+ col(sigCol).as("_sa"): _*)
      .join(
        right.select(keys.map(col) :+ col("id").as("id_r") :+ col(sigCol).as("_sb"): _*),
        keys
      )
      .select("id_l", "id_r", "_sa", "_sb")
  }
}
