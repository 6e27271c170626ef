package graft.profiler

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("estimates never undercount and respect the e*N/width overcount bound") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: item i appears ~1000/i times
    val items = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    val shuffled = rnd.shuffle(items)
    val truth = shuffled.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = shuffled
      .toDF("x")
      .repartition(7)
      .agg(CountMin.sketch(depth, width)($"x").as("s"))
      .as[Seq[Long]]
      .collect()
      .head
    val n = shuffled.size
    val bound = math.ceil(math.E * n / width).toLong
    truth.foreach { case (item, t) =>
      val est = CountMin.estimate(sk, depth, width, item)
      assert(est >= t, s"$item undercounted: $est < $t")
      assert(est <= t + bound, s"$item overcounted past the bound: $est > $t + $bound")
    }
    // an item never seen estimates within the same bound of zero
    assert(CountMin.estimate(sk, depth, width, "never-seen") <= bound)
  }

  test("sketches add: partitioned aggregation equals single-partition exactly") {
    val items = (1 to 500).map(i => s"k${i % 13}")
    def run(parts: Int): Seq[Long] = items
      .toDF("x")
      .repartition(parts)
      .agg(CountMin.sketch(depth, width)($"x").as("s"))
      .as[Seq[Long]]
      .collect()
      .head
    assert(run(1) == run(11), "counter-wise addition must be partition-invariant")
  }

  test("per-group sketches stay independent; nulls are skipped") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", null), ("b", "x")).toDF("g", "v")
    val out = df
      .groupBy("g")
      .agg(CountMin.sketch(depth, width)($"v").as("s"))
      .as[(String, Seq[Long])]
      .collect()
      .toMap
    assert(CountMin.estimate(out("a"), depth, width, "x") == 2L)
    assert(CountMin.estimate(out("b"), depth, width, "x") == 1L)
    assert(out("a").sum == 2L * depth) // the null added nothing
  }
}
