package graft.similarity

import graft.SparkSpec
import graft.functions.HashKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** Product-quantization ANN: kernel exactness (ADC is literally the
  * dot with the reconstruction), the saturated-rerank equivalence that
  * anchors the whole pipeline to brute force, and dirty-input
  * tolerance. The production-config recall floor lives in
  * AnnRecallSpec with the other approximate paths.
  */
class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  private def randBooks(m: Int, ksub: Int, subDim: Int): Array[Array[Array[Double]]] =
    Array.fill(m, ksub, subDim)(rnd.nextDouble() * 4 - 2)

  private def flatten(b: Array[Array[Array[Double]]]): Array[Double] =
    b.flatMap(_.flatten)

  test("pqEncode picks the argmin sub-centroid in every subspace") {
    val (m, ksub, subDim) = (4, 7, 3)
    val books = randBooks(m, ksub, subDim)
    (1 to 50).foreach { _ =>
      val v = Array.fill(m * subDim)(rnd.nextDouble() * 4 - 2)
      val codes = HashKernels
        .pqEncode(new GenericArrayData(v), flatten(books), m, ksub, subDim)
        .toIntArray()
      assert(codes.length == m)
      codes.zipWithIndex.foreach { case (c, mi) =>
        val sub = v.slice(mi * subDim, (mi + 1) * subDim)
        def d2(cent: Array[Double]) =
          sub.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
        val best = books(mi).map(d2).zipWithIndex.minBy { case (d, j) => (d, j) }._2
        assert(c == best, s"subspace $mi: code $c, argmin $best")
      }
    }
  }

  test("ADC dot equals the dot with the reconstruction, bit for bit") {
    val (m, ksub, subDim) = (5, 9, 4)
    val books = randBooks(m, ksub, subDim)
    val flat = flatten(books)
    (1 to 50).foreach { _ =>
      val q = Array.fill(m * subDim)(rnd.nextDouble() * 4 - 2)
      val c = Array.fill(m * subDim)(rnd.nextDouble() * 4 - 2)
      val codes = HashKernels.pqEncode(new GenericArrayData(c), flat, m, ksub, subDim)
      val tab = HashKernels.pqAdcTable(new GenericArrayData(q), flat, m, ksub, subDim)
      val adc = HashKernels.pqAdcDot(codes, tab, ksub)
      // reconstruction = concatenation of the chosen sub-centroids;
      // ADC must equal sum over subspaces of dot(q_m, centroid) with
      // the same left-to-right, per-subspace accumulation order
      val expected = codes
        .toIntArray()
        .zipWithIndex
        .map { case (code, mi) =>
          var s = 0.0
          var i = 0
          while (i < subDim) { s += q(mi * subDim + i) * books(mi)(code)(i); i += 1 }
          s
        }
        .foldLeft(0.0)(_ + _)
      assert(adc == expected)
    }
  }

  // deterministic clustered cloud, same shape as AnnRecallSpec's
  private lazy val cloud = {
    val r = new scala.util.Random(4321)
    val centers = Array.fill(10, 16)(r.nextDouble() * 20.0 - 10.0)
    (0 until 800)
      .map { i =>
        val c = centers(i % 10)
        (i.toLong, c.map(x => x + r.nextGaussian() * 0.6))
      }
      .toDF("vec_id", "embedding")
  }

  test("saturated-rerank pqTopK equals brute force regardless of the fitted codebooks") {
    val queries = cloud.where($"vec_id" < 10)
    val pq = Similarity
      .pqTopK(queries, cloud, "vec_id", "embedding", k = 5,
        m = 4, ksub = 8, rerankFactor = 200) // 200*5 >= 800: full short list
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val brute = Similarity
      .bruteForceTopK(queries, cloud, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    assert(pq === brute)
  }

  test("the candidate pass scans codes inside whole-stage codegen — no UDF, no float vectors") {
    // a parquet-backed corpus: over a LocalRelation the optimizer
    // constant-folds the encode projection away, hiding the expression
    val dir = java.nio.file.Files.createTempDirectory("pqplan").toString + "/data"
    cloud.write.parquet(dir)
    val corpus = spark.read.parquet(dir)
    val queries = corpus.where($"vec_id" < 3)
    val df = Similarity.pqTopK(queries, corpus, "vec_id", "embedding", k = 3, m = 4, ksub = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode"), "encode must be the native expression")
    assert(plan.contains("pq_adc_dot"), "scoring must be the native expression")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("dirty vectors drop out instead of crashing: null, ragged, zero") {
    val dirty = cloud.union(
      Seq(
        (9001L, null.asInstanceOf[Array[Double]]),
        (9002L, Array(1.0, 2.0)), // ragged (dim 2 vs 16)
        (9003L, Array.fill(16)(0.0)) // zero norm
      ).toDF("vec_id", "embedding")
    )
    val out = Similarity
      .pqTopK(cloud.where($"vec_id" < 5), dirty, "vec_id", "embedding", k = 5,
        m = 4, ksub = 8)
      .select("neighbor_id")
      .as[Long]
      .collect()
    assert(out.nonEmpty)
    assert(!out.exists(id => id >= 9001L && id <= 9003L))
  }

  test("fit validates its contract: dim divisible by m, positive params") {
    intercept[IllegalArgumentException](
      Similarity.pqTopK(cloud, cloud, "vec_id", "embedding", k = 5, m = 5)
    ) // 16 % 5 != 0
    intercept[IllegalArgumentException](
      Similarity.pqTopK(cloud, cloud, "vec_id", "embedding", k = 0)
    )
    intercept[IllegalArgumentException](
      Similarity.pqTopK(cloud, cloud, "vec_id", "embedding", k = 5, rerankFactor = 0)
    )
  }
}
