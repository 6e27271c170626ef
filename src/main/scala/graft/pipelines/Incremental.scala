package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/restart contract for multi-day corpus prepares: run
  * [[Corpus.prepareFunnel]] batch-by-batch (one batch per crawl day /
  * dump / ingest unit), survive a mid-run failure without recomputing
  * finished batches, and deduplicate each new batch against everything
  * already kept.
  *
  * Layout under `root`:
  * {{{
  *   batches/batch=<id>/        full funnel output for the batch
  *   fingerprints/batch=<id>/   (fp) of the batch's KEPT docs only
  *   _manifest/<id>             zero-byte marker, written LAST
  * }}}
  *
  * The marker is the commit point: a batch is visible to
  * [[preparedCorpus]], [[committedBatches]] and later batches' dedup
  * ONLY once its marker exists, and the marker is written after both
  * parquet trees are fully materialized. A crash anywhere earlier
  * leaves an uncommitted directory that the re-run overwrites —
  * [[prepareBatch]] is idempotent per (root, batchId).
  *
  * Cross-batch dedup: a doc whose fingerprint was kept by ANY earlier
  * committed batch is demoted to `drop_reason = "duplicate_prior"`.
  * Rule-failed and within-batch-duplicate rows keep their first-failing
  * reason — the prior-dup check applies only to rows the batch funnel
  * would otherwise keep, so the accounting stays first-failing end to
  * end. Kept fingerprints are therefore DISJOINT across committed
  * batches (a fingerprint is kept by exactly the first batch that saw
  * it), which keeps the prior side of the dedup join duplicate-free by
  * construction.
  *
  * Scale shape: each batch pays its own funnel (one scan + the one
  * fingerprint shuffle dedup needs) plus one equi-join against the
  * prior fingerprint table — 16-byte md5 keys, no document payload on
  * the build side, ~N_kept rows after any number of batches. Batches
  * are sequential by contract (each must see its predecessors'
  * fingerprints); run one prepare at a time per root.
  */
object Incremental {

  private def fs(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration
    )

  private def marker(root: String, batchId: String) =
    new org.apache.hadoop.fs.Path(s"$root/_manifest/$batchId")

  private def requireValidId(batchId: String): Unit =
    require(
      batchId.nonEmpty && batchId.matches("[A-Za-z0-9._-]+"),
      s"batch id must match [A-Za-z0-9._-]+, got '$batchId'"
    )

  /** True once `batchId`'s commit marker exists under `root`. */
  def isCommitted(spark: SparkSession, root: String, batchId: String): Boolean = {
    requireValidId(batchId)
    fs(spark, root).exists(marker(root, batchId))
  }

  /** Committed batch ids under `root`, lexicographically sorted (date-
    * shaped ids come out in day order).
    */
  def committedBatches(spark: SparkSession, root: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/_manifest")
    val f = fs(spark, root)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName).toSeq.sorted
  }

  /** Kept-doc fingerprints of every committed batch — read by explicit
    * committed paths, so an uncommitted (crashed) directory can never
    * leak into dedup.
    */
  private def priorFingerprints(
      spark: SparkSession,
      root: String
  ): Option[DataFrame] = {
    val f = fs(spark, root)
    val paths = committedBatches(spark, root)
      .map(id => s"$root/fingerprints/batch=$id")
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p)))
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Prepare one batch under the checkpoint contract. Returns false
    * (and does NOTHING) when the batch is already committed; true when
    * it ran. Parameters mirror [[Corpus.prepareFunnel]].
    */
  def prepareBatch(
      docs: DataFrame,
      root: String,
      batchId: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      keepLang: String = "en",
      decontaminateAgainst: Option[DataFrame] = None,
      spanWords: Int = 8,
      minShared: Long = 1,
      extraStages: Seq[(String, Column)] = Nil
  ): Boolean = {
    requireValidId(batchId)
    val spark = docs.sparkSession
    if (isCommitted(spark, root, batchId)) return false
    val funnel = Corpus.prepareFunnel(
      docs, textCol, idCol, keepLang,
      decontaminateAgainst, spanWords, minShared, extraStages)
    // demote would-be-kept rows whose fingerprint an earlier committed
    // batch already kept; everything else keeps its first-failing
    // reason untouched
    val withPrior = priorFingerprints(spark, root) match {
      case None => funnel
      case Some(prior) =>
        funnel
          .withColumn("_fp", graft.text.Text.fingerprint(col(textCol)))
          .join(
            prior.select(col("fp").as("_fp")).withColumn("_dup_prior", lit(true)),
            Seq("_fp"),
            "left"
          )
          .withColumn(
            "drop_reason",
            when(col("kept") && col("_dup_prior"), lit("duplicate_prior"))
              .otherwise(col("drop_reason"))
          )
          .withColumn("kept", col("drop_reason") === "kept")
          .drop("_fp", "_dup_prior")
    }
    withPrior.write.mode("overwrite").parquet(s"$root/batches/batch=$batchId")
    // fingerprints are derived from the WRITTEN output (one cheap scan
    // of kept rows), not from the live plan — deriving from the plan
    // would re-execute the whole funnel a second time
    spark.read
      .parquet(s"$root/batches/batch=$batchId")
      .where(col("kept"))
      .select(graft.text.Text.fingerprint(col(textCol)).as("fp"))
      .write
      .mode("overwrite")
      .parquet(s"$root/fingerprints/batch=$batchId")
    val f = fs(spark, root)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_manifest"))
    f.create(marker(root, batchId), true).close()
    true
  }

  /** The prepared corpus so far: kept rows of every committed batch,
    * with the `batch` partition column riding along. Uncommitted
    * directories are invisible.
    */
  def preparedCorpus(spark: SparkSession, root: String): DataFrame = {
    val paths = committedBatches(spark, root).map(id => s"$root/batches/batch=$id")
    require(paths.nonEmpty, s"no committed batches under $root")
    spark.read
      .option("basePath", s"$root/batches")
      .parquet(paths: _*)
      .where(col("kept"))
  }

  /** Per-batch funnel loss report over every committed batch — the
    * trend input ("dedup loss is climbing day over day") for
    * [[graft.service.Service.profileFunnel]] / the HTML funnel page.
    * Same aggregation shape as [[Corpus.funnelStats]], keyed by batch.
    */
  def funnelStatsByBatch(
      spark: SparkSession,
      root: String,
      weightCol: Option[String] = None
  ): DataFrame = {
    val paths = committedBatches(spark, root).map(id => s"$root/batches/batch=$id")
    require(paths.nonEmpty, s"no committed batches under $root")
    val all = spark.read.option("basePath", s"$root/batches").parquet(paths: _*)
    val aggs = count(lit(1)).as("n_docs") +:
      weightCol.toSeq.map(w =>
        sum(col(w).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long")
          .as(s"sum_$w")
      )
    all
      .groupBy(col("batch"), col("drop_reason"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("batch"), col("drop_reason"))
  }
}
