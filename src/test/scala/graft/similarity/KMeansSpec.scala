package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("two well-separated blobs resolve to two pure clusters") {
    // blob A around (0,0), blob B around (10,10); ids interleaved so
    // the first-k init straddles both blobs
    val df = Seq(
      (1L, Array(0.1f, 0.0f)),
      (2L, Array(10.0f, 10.1f)),
      (3L, Array(0.0f, 0.2f)),
      (4L, Array(9.9f, 10.0f)),
      (5L, Array(0.2f, 0.1f)),
      (6L, Array(10.1f, 9.9f))
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .kMeansAssign(df, "vec_id", "embedding", k = 2, iterations = 2)
      .as[(Long, Int, Double)]
      .collect()
      .map(t => t._1 -> t._2)
      .toMap
    // init: cluster 0 = vec 1 (blob A), cluster 1 = vec 2 (blob B)
    assert(Set(1L, 3L, 5L).map(got) == Set(0))
    assert(Set(2L, 4L, 6L).map(got) == Set(1))
  }

  test("one iteration reproduces the hand-computed centroid and distances") {
    // k=1: centroid after the M-step is the plain mean; final distances
    // are against that mean
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(4.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .kMeansAssign(df, "vec_id", "embedding", k = 1, iterations = 1)
      .as[(Long, Int, Double)]
      .collect()
      .sortBy(_._1)
    assert(got.map(_._2).toSet == Set(0))
    // mean = (2,0): dists 4, 0, 4
    assert(got.map(_._3).toSeq == Seq(4.0, 0.0, 4.0))
  }

  test("a cluster that loses every member drops out and its label is not reused") {
    // ids 1 and 2 share a position, so init centroids 0 and 1 coincide;
    // the smaller-index tie-break drains cluster 1 in round 1 and it
    // must never come back. Cluster 2 keeps the far blob under its
    // ORIGINAL label (no re-indexing after the drop).
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(9.0f, 0.0f)),
      (4L, Array(9.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .kMeansAssign(df, "vec_id", "embedding", k = 3, iterations = 3)
      .as[(Long, Int, Double)]
      .collect()
      .map(t => t._1 -> t._2)
      .toMap
    assert(Set(1L, 2L).map(got) == Set(0), "coincident centroids drain to index 0")
    assert(Set(3L, 4L).map(got) == Set(2), "surviving labels keep init indices")
  }

  test("equidistant point tie-breaks to the smaller cluster index") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(4.0f, 0.0f)),
      (3L, Array(2.0f, 0.0f)) // exactly between the two init centroids
    ).toDF("vec_id", "embedding")
    val got = Similarity
      .kMeansAssign(df, "vec_id", "embedding", k = 2, iterations = 1)
      .as[(Long, Int, Double)]
      .collect()
      .map(t => t._1 -> t._2)
      .toMap
    assert(got(3L) == 0)
  }
}
