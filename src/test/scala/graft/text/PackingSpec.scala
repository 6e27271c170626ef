package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packing invariants: exhaustive, budget-respecting, dense, oversize flagged") {
    val rnd = new Random(11)
    val budget = 100L
    val docs = (1L to 400L).map(id => (id, (rnd.nextInt(60) + 5).toLong)) ++
      Seq((900L, 250L), (901L, 101L)) // oversize
    val df = docs.toDF("doc_id", "n_tokens").repartition(4)
    val packed = Packing.packGreedy(df, "doc_id", "n_tokens", budget).cache()

    // every doc in exactly one pack
    assert(packed.count() == docs.size)
    assert(packed.select("doc_id").distinct().count() == docs.size)

    val perPack = packed
      .groupBy("pack_id")
      .agg(
        sum("n_tokens").as("used"),
        max(col("oversize").cast("int")).as("over"),
        count(lit(1)).as("n")
      )
      .collect()

    // no non-oversize pack exceeds the budget
    assert(perPack.filter(_.getAs[Int]("over") == 0).forall(_.getAs[Long]("used") <= budget))
    // oversize docs are singleton packs, flagged
    val overPacks = perPack.filter(_.getAs[Int]("over") == 1)
    assert(overPacks.length == 2 && overPacks.forall(_.getAs[Long]("n") == 1L))

    // density: at most one pack PER PARTITION may be <= half full
    // (any-fit: two half-empty packs would have been merged)
    val sparse = perPack.filter(r =>
      r.getAs[Int]("over") == 0 && r.getAs[Long]("used") * 2 <= budget
    )
    val partitionsUsed = packed
      .where(!col("oversize"))
      .select(split(col("pack_id"), "-").getItem(0))
      .distinct()
      .count()
    assert(sparse.length <= partitionsUsed)

    packed.unpersist()
  }

  test("packing runs shuffle-free") {
    val df = (1L to 50L).map(id => (id, 10L)).toDF("doc_id", "n_tokens")
    val plan = Packing
      .packGreedy(df, "doc_id", "n_tokens", 100)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), "packing must not shuffle")
  }

  test("packStats buckets fills by decile and isolates oversize") {
    // hand-built packed frame: full pack (100), half pack (55),
    // near-empty pack (5), one oversize singleton (150)
    val packed = Seq(
      ("a", 1L, 60L, false), ("a", 2L, 40L, false),
      ("b", 3L, 55L, false),
      ("c", 4L, 5L, false),
      ("ov", 5L, 150L, true)
    ).toDF("pack_id", "doc_id", "n_tokens", "oversize")
    val stats = Packing.packStats(packed, budget = 100).collect()
    val byDecile = stats.map(r => r.getLong(0) -> r).toMap
    assert(byDecile.keySet === Set(0L, 5L, 9L, 10L))
    assert(byDecile(9L).getAs[Long]("n_packs") === 1L) // the full pack
    assert(byDecile(9L).getAs[Long]("n_docs") === 2L)
    assert(byDecile(9L).getAs[Double]("mean_fill") === 1.0)
    assert(byDecile(5L).getAs[Double]("mean_fill") === 0.55)
    assert(byDecile(0L).getAs[Long]("tokens") === 5L)
    assert(byDecile(10L).getAs[Long]("n_packs") === 1L) // oversize bucket
    assert(byDecile(10L).getAs[Double]("mean_fill") === 1.5)
  }

  test("packGreedy fails loudly on NULL ids/counts and negative counts") {
    // both pass the plan-time TYPE checks; unguarded they die mid-job
    // with an opaque encoder NPE (null) or silently inflate pack
    // capacity (negative)
    val withNull = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, 5L)
    ).toDF("doc_id", "n_tokens")
    val e1 = intercept[Exception] {
      Packing.packGreedy(withNull, "doc_id", "n_tokens", 100L).collect()
    }
    assert(e1.getMessage != null)
    val negative = Seq((1L, 10L), (2L, -3L)).toDF("doc_id", "n_tokens")
    intercept[Exception] {
      Packing.packGreedy(negative, "doc_id", "n_tokens", 100L).collect()
    }
  }
}
