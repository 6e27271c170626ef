package graft.profiler

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("small domains are exact: sketch equals groupBy counts") {
    val data = Seq.tabulate(300)(i => s"v${i % 4}") // 4 distinct < k-1
    val got = data
      .toDF("x")
      .agg(HeavyHitters.sketch(10)(col("x")).as("hh"))
      .selectExpr("explode(hh) as (item, est)")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == Map("v0" -> 75L, "v1" -> 75L, "v2" -> 75L, "v3" -> 75L))
  }

  test("null values are skipped, not inserted as map keys") {
    val got = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("x")
      .agg(HeavyHitters.sketch(5)(col("x")).as("hh"))
      .selectExpr("explode(hh) as (item, est)")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("MG bound holds under partial aggregation and merge on skewed data") {
    val rnd = new Random(42)
    val k = 20
    // zipf-ish: a few hot items over a long tail of 500 cold ones
    val items = Seq.fill(8000) {
      val r = rnd.nextInt(100)
      if (r < 30) "hot0"
      else if (r < 50) "hot1"
      else if (r < 60) "hot2"
      else s"cold${rnd.nextInt(500)}"
    }
    val exact: Map[String, Long] =
      items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val n = items.size.toLong
    val est = items.toDF("x")
      .repartition(7) // force several partials + a real merge
      .agg(HeavyHitters.sketch(k)(col("x")).as("hh"))
      .selectExpr("explode(hh) as (item, est)")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(est.size <= k - 1, "sketch must keep at most k-1 counters")
    // every stored estimate is a lower bound within n/k of the truth
    est.foreach { case (item, e) =>
      assert(e <= exact(item), s"$item overestimated")
      assert(exact(item) - e <= n / k, s"$item outside the MG bound")
    }
    // every item with true frequency > n/k must be present
    exact.filter(_._2 > n / k).keys.foreach { hot =>
      assert(est.contains(hot), s"frequent item $hot missing from sketch")
    }
  }
}
