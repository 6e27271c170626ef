package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // three tight "paraphrase" clusters around orthogonal axes plus two
  // isolated singletons — cluster members have cosine > 0.99 with each
  // other and < 0.2 across clusters
  private def planted = {
    def jitter(base: Array[Float], eps: Float, slot: Int): Array[Float] = {
      val v = base.clone(); v(slot) = v(slot) + eps; v
    }
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val e3 = Array(0f, 0f, 1f, 0f)
    val rows =
      (1 to 5).map(i => (i.toLong, jitter(e1, 0.01f * i, 1))) ++
        (11 to 15).map(i => (i.toLong, jitter(e2, 0.01f * (i - 10), 2))) ++
        (21 to 25).map(i => (i.toLong, jitter(e3, 0.01f * (i - 20), 3))) ++
        Seq((31L, Array(0f, 0f, 0f, 1f)), (32L, Array(0.7f, -0.7f, 0f, 0f)))
    rows.toDF("vec_id", "embedding")
  }

  test("sweep keeps one representative per planted semantic cluster") {
    val kept = Similarity
      .semanticDedupSweep(planted, "vec_id", "embedding", threshold = 0.9, nlist = 4)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSet
    assert(kept === Set(1L, 11L, 21L, 31L, 32L))
  }

  test("nlist=1 pairs equal exact all-pairs cosine above threshold") {
    // with one cell the blocking is trivial, so the pipeline must
    // reproduce brute-force pairs exactly (bucketCap=0 = uncapped)
    val got = Similarity
      .semanticDedupPairs(planted, "vec_id", "embedding", 0.9, nlist = 1, bucketCap = 0)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val a = planted.select(col("vec_id").as("id_a"), col("embedding").as("_va"))
    val b = planted.select(col("vec_id").as("id_b"), col("embedding").as("_vb"))
    val want = a
      .join(b, col("id_a") < col("id_b"))
      .where(Similarity.cosine(col("_va"), col("_vb")) >= 0.9)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got === want && got.nonEmpty)
  }

  test("a degenerate all-identical cluster dedups under a tight bucket cap") {
    // 40 identical embeddings, cap 4: the hot-bucket star still links
    // every member to the root, so the sweep keeps exactly one
    val many = (1 to 40).map(i => (i.toLong, Array(1f, 1f, 0f))).toDF("vec_id", "embedding")
    val kept = Similarity
      .semanticDedupSweep(many, "vec_id", "embedding", 0.99, nlist = 2, bucketCap = 4)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSeq
    assert(kept === Seq(1L))
  }

  test("zero-norm and null embeddings survive the sweep untouched") {
    val dirty = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(1f, 0f)),
      (3L, Array(0f, 0f)),
      (4L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val kept = Similarity
      .semanticDedupSweep(dirty, "vec_id", "embedding", 0.9, nlist = 1)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSet
    // 2 drops as 1's duplicate; 3 and 4 have no cosine, never pair, stay
    assert(kept === Set(1L, 3L, 4L))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](
      Similarity.semanticDedupPairs(planted, "vec_id", "embedding", 1.5)
    )
    intercept[IllegalArgumentException](
      Similarity.semanticDedupPairs(planted, "vec_id", "embedding", 0.9, nlist = 4, nAssign = 5)
    )
  }
}
