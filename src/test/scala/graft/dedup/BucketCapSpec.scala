package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-bucket bound on the LSH / pigeonhole pair pipelines: a planted
  * boilerplate cluster (many identical documents — one (band, bucket)
  * key per band holds the whole cluster) must produce O(cluster)
  * candidate pairs under the cap, not |cluster|^2, while every sweep
  * still removes the full cluster.
  */
class BucketCapSpec extends SparkSpec {
  import spark.implicits._

  private val clusterSize = 1000
  // 1000 identical docs (ids 1..1000) + distinct docs (ids 2001+)
  private lazy val corpus = {
    val boiler = (1 to clusterSize).map(i =>
      (i.toLong, "all rights reserved this page is auto generated boilerplate content please do not edit"))
    val distinct = Seq(
      (2001L, "completely different content about distributed query engines and shuffles here now"),
      (2002L, "another unrelated document discussing seasonal forecast models and thresholds today"),
      (2003L, "a third standalone text with nothing in common with the planted boilerplate cluster")
    )
    (boiler ++ distinct).toDF("doc_id", "text")
  }

  test("capped minhash LSH emits a bounded star for the hot bucket, not |bucket|^2 pairs") {
    val pairs = Dedup
      .minhashLshPairs(corpus, "text", "doc_id", threshold = 0.5, bucketCap = 64)
      .cache()
    val n = pairs.count()
    // star: every cluster member pairs with the min id exactly once
    // (identical docs collide on every band; distinct() collapses the
    // per-band copies). Uncapped this would be 1000*999/2 = 499500.
    assert(n == (clusterSize - 1).toLong, s"expected ${clusterSize - 1} star pairs, got $n")
    val ids = pairs.select("id_a").as[Long].collect().toSet
    assert(ids == Set(1L), s"all star pairs must anchor at the bucket min id, got $ids")
    pairs.unpersist()
  }

  test("capped sweep removes the full cluster — same survivors as uncapped") {
    val capped = Dedup
      .minhashDedup(corpus, "text", "doc_id", threshold = 0.5, bucketCap = 64)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(capped == Seq(1L, 2001L, 2002L, 2003L))
    // small corpus, so the uncapped sweep is feasible and must agree
    val uncapped = Dedup
      .minhashDedup(corpus, "text", "doc_id", threshold = 0.5, bucketCap = 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(capped == uncapped)
  }

  test("capped component sweep stays connected through the star edges") {
    val pairs = Dedup.minhashLshPairs(corpus, "text", "doc_id", threshold = 0.5, bucketCap = 32)
    val kept = Dedup
      .componentSweep(corpus, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2001L, 2002L, 2003L))
  }

  test("cap only changes hot buckets: small-bucket corpora are pair-identical") {
    val small = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (3L, "the quick brown fox jumps over the lazy cat and runs far away today"),
      (4L, "completely different content about distributed query engines and shuffles here now")
    ).toDF("doc_id", "text")
    def run(cap: Int) = Dedup
      .minhashLshPairs(small, "text", "doc_id", numHashes = 32, bands = 16, threshold = 0.4, bucketCap = cap)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(run(1024) == run(0))
    assert(run(1024).contains((1L, 2L, 1.0)))
  }

  test("capped simhash pigeonhole emits bounded pairs for an identical cluster") {
    val pairs = Dedup
      .simhashPairs(corpus, "text", "doc_id", maxHamming = 3, bucketCap = 64)
      .cache()
    val n = pairs.count()
    assert(n == (clusterSize - 1).toLong, s"expected ${clusterSize - 1} star pairs, got $n")
    assert(pairs.select("id_a").as[Long].collect().toSet == Set(1L))
    pairs.unpersist()
  }

  test("cross-corpus cap bounds bench-side fan-out but keeps every corpus doc's flag") {
    // hot bucket on BOTH sides: 200 identical bench docs, 300 identical
    // corpus docs sharing the bench text
    val bench = (1 to 200)
      .map(i => (i.toLong, "shared boilerplate text that appears in benchmark and training corpus alike"))
      .toDF("doc_id", "text")
    val train = ((1 to 300)
      .map(i => (1000L + i, "shared boilerplate text that appears in benchmark and training corpus alike")) :+
      (2000L, "clean training document with no overlap at all against the benchmark suite"))
      .toDF("doc_id", "text")
    val pairs = Dedup
      .crossMinhashPairs(bench, train, "text", "doc_id", threshold = 0.5, leftBucketCap = 8)
      .cache()
    // every contaminated corpus doc is flagged...
    val flagged = pairs.select("id_r").distinct().as[Long].collect().toSet
    assert(flagged == (1 to 300).map(1000L + _).toSet)
    // ...against at most leftBucketCap bench docs each
    val maxFan = pairs.groupBy("id_r").count().agg(max("count")).as[Long].head()
    assert(maxFan <= 8L, s"per-corpus-doc bench fan-out $maxFan exceeds cap")
    pairs.unpersist()
  }

  test("recall study: near-identical boilerplate under a tight cap — bounded, one-sided loss") {
    // the cap's trade on NEAR-identical variants (each doc mutates one
    // word of a shared template — the realistic boilerplate shape), as
    // MEASURED rather than assumed: direct pairs drop to the star
    // core, and the sweep can leave a few extra survivors — a member
    // whose noisy estimated similarity to its bucket root misses the
    // threshold loses the member-member edges that would have caught
    // it (the BucketJoin docstring's documented trade). The loss is
    // one-sided (never over-deletes) and small; this spec pins both.
    val template = ("all rights reserved this page is auto generated boilerplate " +
      "content please contact the site administrator for removal requests today").split(" ")
    val family = (1 to 300).map { i =>
      val w = template.clone(); w(i % template.length) = s"variant$i"
      (i.toLong, w.mkString(" "))
    }
    val clean = Seq(
      (9001L, "completely different content about distributed query engines and shuffles here now"))
    val corpus = (family ++ clean).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup
      .minhashLshPairs(corpus, "text", "doc_id", threshold = 0.5, bucketCap = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairs(0)
    val capped = pairs(16)
    assert(capped.subsetOf(exact), "cap must never invent pairs")
    val pairRecall = capped.size.toDouble / exact.size
    info(f"direct-pair recall under cap 16: $pairRecall%.3f (${capped.size}/${exact.size})")
    assert(pairRecall < 1.0, "a tight cap on a 300-doc family must drop direct pairs")
    assert(pairRecall > 0.05, "the star must retain a non-trivial pair core")
    // sweep-level: the capped sweep may MISS duplicates (extra
    // survivors) but must never delete a doc the exact sweep keeps
    def survivors(cap: Int) = Dedup
      .componentSweep(corpus, Dedup.minhashLshPairs(
        corpus, "text", "doc_id", threshold = 0.5, bucketCap = cap), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val exactSurv = survivors(0)
    val cappedSurv = survivors(16)
    assert(exactSurv.subsetOf(cappedSurv),
      "the cap must only MISS duplicates, never over-delete")
    val extra = cappedSurv.size - exactSurv.size
    info(s"sweep survivors: uncapped ${exactSurv.size}, capped ${cappedSurv.size} (+$extra)")
    assert(extra <= 15, // <= 5% of the 300-doc family
      s"capped sweep left $extra extra survivors — recall loss beyond the documented trade")
  }

  test("portable family honors the cap with identical star semantics") {
    val pairs = PortableDedup
      .minhashLshPairs(corpus, "text", "doc_id", threshold = 0.5, bucketCap = 64)
      .cache()
    assert(pairs.count() == (clusterSize - 1).toLong)
    assert(pairs.select("id_a").as[Long].collect().toSet == Set(1L))
    pairs.unpersist()
  }
}
