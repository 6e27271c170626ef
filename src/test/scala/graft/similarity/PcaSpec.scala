package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance block matches hand math; null/short vectors excluded") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 6.0f)),
      (3L, Array(5.0f, 10.0f)),
      (4L, null.asInstanceOf[Array[Float]]),
      (5L, Array(9.0f)) // too short for dim 1
    ).toDF("vec_id", "embedding")
    val got = Pca
      .covarianceBlock(df, "embedding", Seq(0, 1))
      .orderBy("i", "j")
      .as[(Int, Int, Long, Double)]
      .collect()
    // dims over rows (1,2),(3,6),(5,10): var0 = 8/3, cov01 = 16/3, var1 = 32/3
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((0, 0, 3L), (0, 1, 3L), (1, 1, 3L)))
    assert(math.abs(got(0)._4 - 8.0 / 3) < 1e-6)
    assert(math.abs(got(1)._4 - 16.0 / 3) < 1e-6)
    assert(math.abs(got(2)._4 - 32.0 / 3) < 1e-6)
    // a NULL SLOT row must be excluded too — counting it in n while
    // sum() skips its contribution would silently understate every
    // mean and covariance (same moments, n unchanged at 3)
    val withNullSlot = df.union(
      spark.range(1).selectExpr(
        "CAST(6 AS BIGINT) AS vec_id",
        "array(CAST(7.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding"
      )
    )
    val got2 = Pca
      .covarianceBlock(withNullSlot, "embedding", Seq(0, 1))
      .orderBy("i", "j")
      .as[(Int, Int, Long, Double)]
      .collect()
    assert(got2.map(g => (g._1, g._2, g._3, g._4)).toSeq ==
      got.map(g => (g._1, g._2, g._3, g._4)).toSeq)
    // the one-pass whiten fit applies the same exclusion
    val (m1, mu1) = Pca.fitMoments(df, "embedding", Seq(0, 1))
    val (m2, mu2) = Pca.fitMoments(withNullSlot, "embedding", Seq(0, 1))
    assert(m1.flatten.toSeq == m2.flatten.toSeq && mu1.toSeq == mu2.toSeq)
  }

  test("power iteration recovers a planted dominant direction") {
    // spread 10x along (3,4)/5, 0.1x along the orthogonal (-4,3)/5
    val axis = Array(0.6, 0.8)
    val ortho = Array(-0.8, 0.6)
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val a = rng.nextGaussian() * 10
      val b = rng.nextGaussian() * 0.1
      (i.toLong, Array(
        (a * axis(0) + b * ortho(0)).toFloat,
        (a * axis(1) + b * ortho(1)).toFloat
      ))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cov = Pca.fitCovariance(df, "embedding", Seq(0, 1))
    val (v, eig) = Pca.topComponent(cov)
    val cos = math.abs(v(0) * axis(0) + v(1) * axis(1))
    assert(cos > 0.999, s"recovered $cos")
    assert(eig > 50, s"eigenvalue $eig should carry the 10x spread")
    // unit norm, deterministic sign: largest-magnitude component positive
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
  }

  test("projection is the plain dot and centering shifts it") {
    val df = Seq((1L, Array(2.0f, 0.0f)), (2L, Array(0.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val axis = Array(1.0, 0.5)
    val plain = Pca
      .project(df, "embedding", Seq(0, 1), axis)
      .orderBy("vec_id")
      .select("pc1")
      .as[Double]
      .collect()
    assert(plain.toSeq == Seq(2.0, 2.0))
    val centered = Pca
      .project(df, "embedding", Seq(0, 1), axis, mean = Some(Array(1.0, 2.0)))
      .orderBy("vec_id")
      .select("pc1")
      .as[Double]
      .collect()
    assert(centered.toSeq == Seq(0.0, 0.0))
  }

  test("eigSym solves the textbook 2x2 exactly, descending, deterministic sign") {
    val (vals, vecs) = Pca.eigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r2, r2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(math.abs(vecs(1)(0)) - r2) < 1e-12)
    assert(vecs(1)(0) * vecs(1)(1) < 0, "second eigenvector is the difference direction")
  }

  test("whitening makes the empirical covariance the identity") {
    val rng = new scala.util.Random(11)
    // strongly correlated 3-d cloud with distinct scales
    val rows = (1 to 500).map { i =>
      val a = rng.nextGaussian() * 5
      val b = rng.nextGaussian()
      val c = rng.nextGaussian() * 0.3
      (i.toLong, Array((a).toFloat, (0.8 * a + b).toFloat, (0.2 * b + c).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val white = Pca.whiten(df, "embedding", Seq(0, 1, 2))
    val cov = Pca
      .covarianceBlock(white, "whitened", Seq(0, 1, 2))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3))
      .toMap
    for (i <- 0 to 2) assert(math.abs(cov((i, i)) - 1.0) < 1e-3, s"var($i)=${cov((i, i))}")
    for (i <- 0 to 2; j <- i + 1 to 2)
      assert(math.abs(cov((i, j))) < 1e-3, s"cov($i,$j)=${cov((i, j))}")
  }

  test("eigSym property: reconstruction and orthonormality on random symmetric matrices") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val d = 2 + rng.nextInt(6)
      val m = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val v = (rng.nextDouble() - 0.5) * 10
        m(i)(j) = v; m(j)(i) = v
      }
      val (vals, vecs) = Pca.eigSym(m)
      // eigenvalues descending
      assert(vals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-9),
        s"trial $trial: not descending")
      // orthonormal vectors
      for (a <- 0 until d; b <- a until d) {
        val dot = vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-8, s"trial $trial: <v$a,v$b>=$dot")
      }
      // reconstruction: A = V^T diag(vals) V (vecs(k) is the k-th eigenvector)
      for (i <- 0 until d; j <- 0 until d) {
        val r = (0 until d).map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
        assert(math.abs(r - m(i)(j)) < 1e-8,
          s"trial $trial: A($i,$j) ${m(i)(j)} != $r")
      }
    }
  }

  test("zero matrix keeps the start vector instead of dividing by zero") {
    val (v, eig) = Pca.topComponent(Array.fill(3)(Array.fill(3)(0.0)))
    assert(eig == 0.0 && math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }
}
