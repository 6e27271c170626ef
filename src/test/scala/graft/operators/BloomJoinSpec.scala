package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val fact = (1L to 5000L).map(i => (i, i % 100, s"payload $i")).toDF("fk", "grp", "payload")
  private val dim = (0L until 10L).map(i => (i * 7, s"dim $i")).toDF("dk", "name")

  test("bloom-reduced join returns exactly the plain join's rows") {
    val reduced = BloomJoin
      .bloomReducedJoin(fact, dim, "grp", "dk")
      .select("fk", "grp", "dk", "name")
      .collect()
      .toSet
    val plain = fact
      .join(dim, col("grp") === col("dk"))
      .select("fk", "grp", "dk", "name")
      .collect()
      .toSet
    assert(reduced == plain)
    assert(plain.nonEmpty)
  }

  test("the bloom actually reduces the fact side before the join") {
    val bloom = BloomJoin.buildBloom(dim, "dk")
    val kept = fact.where(BloomJoin.mightContain(bloom, col("grp"))).count()
    // 8 of the 10 dim keys (0,7,...,63) are < 100 and thus joinable;
    // ~8% of fact rows should survive (false positives only add a few)
    assert(kept >= 400, s"bloom dropped true matches: $kept")
    assert(kept < 1000, s"bloom did not reduce: $kept of 5000")
    // membership is complete: every true key passes
    val trueKeys = fact.join(dim, col("grp") === col("dk")).select("fk").count()
    val keptJoin = fact
      .where(BloomJoin.mightContain(bloom, col("grp")))
      .join(dim, col("grp") === col("dk"))
      .select("fk")
      .count()
    assert(keptJoin == trueKeys)
  }

  test("bloom bytes are bounded by numBits, not dim cardinality") {
    val small = BloomJoin.buildBloom(dim, "dk", expectedItems = 100, numBits = 8 * 1024)
    val big = BloomJoin.buildBloom(
      (1L to 20000L).toDF("dk"),
      "dk",
      expectedItems = 100000,
      numBits = 8 * 1024
    )
    assert(small.length <= 8 * 1024 / 8 + 64)
    assert(big.length <= 8 * 1024 / 8 + 64) // 200x the keys, same bytes
  }
}
