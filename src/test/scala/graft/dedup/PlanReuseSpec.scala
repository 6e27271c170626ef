package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale invariant of the capped pair pipelines: adding the
  * hot-bucket window must NOT add a shuffle of the banded table. The
  * window partitions on exactly the (band, bucket) keys the candidate
  * join needs, so the executed plan carries ONE real exchange of the
  * banded rows and every other consumer (both join sides, both cap
  * branches) reuses it via AQE stage reuse.
  */
class PlanReuseSpec extends SparkSpec {
  import spark.implicits._

  test("capped LSH pair plan shuffles the banded table once; all consumers reuse it") {
    // includes a genuine hot bucket so the star branch stays in the
    // executed plan (AQE otherwise empty-propagates it away)
    val docs = ((1 to 40).map(i =>
      (i.toLong, "all rights reserved auto generated boilerplate page please do not edit")) ++
      (100 to 140).map(i =>
        (i.toLong, s"doc number $i with some shared words plus unique token$i here now")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.1, bucketCap = 16)
    // collect() executes THIS dataset's QueryExecution (count() builds a
    // new one, leaving this plan un-finalized and reuse invisible)
    assert(pairs.collect().nonEmpty)
    // the AQE toString carries the final plan first, then "== Initial Plan =="
    val finalPlan = pairs.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(finalPlan.contains("isFinalPlan=true"), "expected an executed adaptive plan")
    val bandExchangeLines = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(band"))
      .toSeq
    val real = bandExchangeLines.filterNot(_.contains("ReusedExchange"))
    val reused = bandExchangeLines.filter(_.contains("ReusedExchange"))
    assert(real.size == 1,
      s"banded table shuffled ${real.size} times — the cap window must share the join exchange")
    assert(reused.size == 3,
      s"expected the 3 other consumers (b-side, hot a/b branches) to reuse the banded exchange, got ${reused.size}")
  }
}
