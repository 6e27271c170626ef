package graft.examples

import graft.dedup.Dedup
import graft.operators.Sampling
import graft.similarity.Similarity
import graft.text.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-data-pipeline quickstart — the LLM-corpus flow graft adds
  * beyond the reference's monitoring surface:
  *
  *  A. rule + score quality filtering (Gopher rules, then score),
  *  B. exact, span-level and MinHash-LSH near-duplicate removal,
  *  C. deterministic train/val/test split (stable across runs),
  *  D. TF-IDF salient terms + int8-quantized similarity search.
  *
  * Run: sbt "runMain graft.examples.PipelineQuickstart [sfDir]"
  */
object PipelineQuickstart {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      // the production wiring is spark.sql.extensions=graft.GraftExtensions
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} documents")

    // A: rule filter first (cheap, scan-side), then score filter
    val ruled = docs
      .withColumn("gopher_reason", Text.gopherReason(col("text"), minWords = 20))
      .where(col("gopher_reason") === "ok")
    val scored = ruled.withColumn("quality", Text.qualityScore(col("text")))
      .withColumn("lang", Text.langId(col("text")))
    val kept = scored.where(col("quality") > 0.3)
    println(s"after rule + quality filters: ${kept.count()}")

    // B: exact dedup, drop span-heavy boilerplate docs, then near-dup
    // sweep over MinHash-LSH pairs
    val exact = Dedup.exactNormalized(kept, "text", "doc_id")
    val spanStats = Dedup.dupSpanStats(exact, "text", "doc_id", spanWords = 8)
    val spanClean = exact.join(
      spanStats.where(col("dup_fraction") <= 0.5).select("doc_id"),
      "doc_id"
    )
    val deduped = Dedup.minhashDedup(spanClean, "text", "doc_id", threshold = 0.5)
    println(s"after dedup: ${deduped.count()}")

    // B': the rule/language/dedup stages above, as ONE single-pass
    // funnel with first-failing accounting — and a domain-mixture
    // draw at a row budget over the survivors
    val funnel = graft.pipelines.Corpus.prepareFunnel(docs)
    graft.pipelines.Corpus.funnelStats(funnel, weightCol = Some("n_chars")).show()
    // the funnel's losses double as metric series: the monitoring half
    // of the library (optimize/score/assess) then watches corpus
    // preparation like any other dataset
    val funnelRepo = new graft.repository.InMemoryRepository()
    graft.service.Service.profileFunnel(
      funnel,
      "ds://quickstart-prepare",
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
      funnelRepo
    )
    println(s"funnel metrics stored: ${funnelRepo.getProfiling("ds://quickstart-prepare").count()}")
    graft.pipelines.Corpus
      .mixtureSample(
        docs.join(funnel.where(col("kept")).select("doc_id"), "doc_id"),
        "doc_id",
        "source",
        Seq("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25),
        budget = 20L
      )
      .groupBy("source")
      .count()
      .orderBy("source")
      .show()

    // B'': the same prepare as a MULTI-DAY incremental run — each
    // day's batch commits atomically (crash-safe restart), dedups
    // exact + NEAR against everything previously kept via stored
    // fingerprints/signatures, and the per-day losses feed the same
    // monitoring flow
    val prepRoot = java.nio.file.Files.createTempDirectory("prep-quickstart").toString
    val (day1, day2) = (docs.where(col("doc_id") < 250), docs.where(col("doc_id") >= 200))
    graft.pipelines.Incremental.prepareBatch(
      day1, prepRoot, "2025-01-01", nearDupThreshold = Some(0.8))
    graft.pipelines.Incremental.prepareBatch(
      day2, prepRoot, "2025-01-02", nearDupThreshold = Some(0.8))
    graft.pipelines.Incremental
      .funnelStatsByBatch(spark, prepRoot, weightCol = Some("n_chars")).show()
    graft.pipelines.Incremental.profileBatches(
      spark, prepRoot, "ds://quickstart-incremental", funnelRepo)
    println(s"incremental corpus so far: " +
      s"${graft.pipelines.Incremental.preparedCorpus(spark, prepRoot).count()} docs")

    // C: stable splits — rerunning on a recomputed corpus keeps every
    // surviving doc in its split
    val split = Sampling.hashSplit(
      deduped, "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    split.groupBy("split").count().orderBy("split").show()

    // D: salient terms of the train split; quantized ANN over embeddings
    Text.tfIdfTopK(split.where(col("split") === "train"), "text", "doc_id", k = 3)
      .orderBy("id", "rank").show(9, truncate = false)
    // unigram LM quality: gibberish scores far below prose — the
    // CCNet-style filter, feedable to Corpus.qualityCut
    Text.unigramLogProb(deduped, "text", "doc_id")
      .orderBy(col("avg_logprob")).show(3, truncate = false)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Similarity.quantizedTopK(emb.limit(2), emb, "vec_id", "embedding", k = 3)
      .show(truncate = false)
    // persisted IVF index: fit + cell assignment paid once, probes
    // read only their cell partitions
    val idxDir = java.nio.file.Files.createTempDirectory("ivf-quickstart").toString
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", idxDir, nlist = 8)
    // excludeSelfMatch: these probes reuse corpus rows as queries
    // (self-ANN), so the row's own index entry must not claim a slot
    Similarity
      .ivfQueryIndex(emb.limit(2), "vec_id", "embedding", idxDir, k = 3, nprobe = 2,
        excludeSelfMatch = true)
      .show(truncate = false)
    // IVF-PQ sidecar: probes scan m ints + a norm per row in the
    // probed cells, exact-cosine rerank recovers full precision
    Similarity.ivfAttachPq(spark, idxDir, m = 8, ksub = 32)
    Similarity
      .ivfPqQueryIndex(emb.limit(2), "vec_id", "embedding", idxDir, k = 3, nprobe = 2,
        excludeSelfMatch = true)
      .show(truncate = false)

    // E: mixture sampling — k docs per source, weighted by length
    // (deterministic: rerunning reproduces the same sample), and a
    // Z-ordered layout so the written files prune on (source-hash,
    // length) filters alike
    Sampling
      .weightedSamplePerGroup(
        split.where(col("split") === "train"),
        Seq("source"),
        "doc_id",
        greatest(col("n_chars"), lit(1)).cast("double"),
        k = 2
      )
      .orderBy("source", "rank")
      .show(6, truncate = false)
    val laidOut = graft.operators.Layout.clusterByZOrder(
      split.withColumn("_src_bucket", pmod(xxhash64(col("source")), lit(64L))),
      Seq("_src_bucket", "n_chars"),
      bits = 6,
      numPartitions = 4
    )
    println(s"z-ordered layout partitions: ${laidOut.rdd.getNumPartitions}")

    // E2: ship it — deterministic shuffle-shard export of the train
    // split: one md5 per row fixes shard membership, file fanout and
    // within-file order on any engine, so "resume from shard 3,
    // row 12008" means the same bytes forever
    val shardDir = java.nio.file.Files.createTempDirectory("shards-quickstart").toString
    graft.pipelines.Export.exportShards(
      split.where(col("split") === "train"),
      "doc_id",
      shardDir,
      nShards = 4,
      filesPerShard = 2
    )
    spark.read.parquet(shardDir).groupBy("shard").count().orderBy("shard").show()

    // F: discriminative quality classifier (graft.ml.Logit) — train on
    // weak labels, check WHICH features carry signal, cross-validate,
    // read the threshold dial, and queue the hardest rows for review
    import graft.ml.Logit
    val feats = docs.select(
      col("doc_id"),
      when(col("n_chars") > 300, 1.0).otherwise(0.0).as("label"),
      graft.functions.round6(Text.stopwordRatio(col("text"))).as("x1"),
      graft.functions.round6(least(Text.meanWordLen(col("text")) / 8.0, lit(1.0))).as("x2"),
      graft.functions
        .round6(least(Text.tokenCount(col("text")).cast("double") / 100.0, lit(1.0)))
        .as("x3")
    )
    Logit.featureStats(feats, "label", Seq("x1", "x2", "x3")).orderBy("feature").show()
    val model = Logit.fit(feats, "label", Seq("x1", "x2", "x3"), iters = 6, lr = 1.5)
    println(s"classifier weights: ${model.weights.mkString(", ")}")
    val clsScored = Logit.scored(feats, model, Seq("x1", "x2", "x3"))
    Logit.cvAuc(feats, "label", Seq("x1", "x2", "x3"), "doc_id", folds = 3, iters = 6, lr = 1.5)
      .orderBy("fold").show()
    Logit.prCurve(clsScored, "label", "score", Seq(0.4, 0.5, 0.6)).orderBy("threshold").show()
    Logit.hardExamples(clsScored, "label", "score", "doc_id", k = 2)
      .orderBy("label", "rank").show()

    // F2: diversity-aware retrieval — MMR rerank collapses
    // near-duplicate neighbors so the k results COVER the neighborhood
    // (eval-set / few-shot-pool construction)
    Similarity
      .mmrTopK(emb.limit(2), emb, "vec_id", "embedding", k = 3, candidates = 10)
      .show(truncate = false)

    // F3: canonicalization before any hash-keyed stage — Unicode
    // normalization folds spelling variants, URL canonicalization
    // folds tracking-param/port/case variants, each one scan-side
    docs
      .select(
        Text.unicodeNormalize(concat(col("text").substr(1, 8), lit(" résumé")))
          .as("nfc"),
        Text.canonicalizeUrl(
          concat(lit("HTTPS://Example.COM:443/p/"), col("doc_id"), lit("?utm_source=x&a=1"))
        ).as("url")
      )
      .show(2, truncate = false)

    // G: the same kernels straight from SQL (GraftExtensions) — what a
    // SQL-only consumer of the cluster sees
    split.createOrReplaceTempView("corpus")
    spark
      .sql("""SELECT source, topk_by(CAST(n_chars AS DOUBLE), doc_id, 2) AS longest
              FROM corpus GROUP BY source ORDER BY source LIMIT 3""")
      .show(truncate = false)
    spark
      .sql("SELECT strip_accents(unicode_normalize('résumé', 'NFC')) AS folded")
      .show()

    spark.stop()
  }
}
