package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-place IVF refit: only affected cell partitions are rewritten;
  * untouched directories survive byte-identical (the write-what-moved
  * scale claim).
  */
class IvfRefitInPlaceSpec extends SparkSpec {
  import spark.implicits._

  private def fileState(dir: String): Map[String, Long] = {
    val root = new java.io.File(s"$dir/cells")
    Option(root.listFiles()).getOrElse(Array.empty).flatMap { cd =>
      Option(cd.listFiles()).getOrElse(Array.empty).map(f =>
        s"${cd.getName}/${f.getName}" -> f.lastModified())
    }.toMap
  }

  private def assertConsistent(dir: String): Unit = {
    // invariant after any refit: every stored assignment equals the
    // nearest stored centroid
    val cents = spark.read.parquet(s"$dir/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    val bad = spark.read.parquet(s"$dir/cells")
      .where(col("cell").isNotNull)
      .withColumn("_want",
        graft.functions.hashExpressions.nearestCells(col("_cv"), cents, 1)(0))
      .where(col("cell") =!= col("_want"))
      .count()
    assert(bad === 0L, "stored cells must match the stored quantizer")
  }

  test("a refit that moves nothing leaves every file untouched") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinp1").toString
    val clustered = (
      (0 until 200).map(i => (i.toLong, Array(10.0 + i * 0.01, 0.1 * (i % 5), 0.0))) ++
        (200 until 400).map(i => (i.toLong, Array(0.0, 10.0 + i * 0.01, 0.1 * (i % 5))))
    ).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(clustered, "vec_id", "embedding", dir, nlist = 2)
    val before = fileState(dir)
    val report = Similarity.ivfRefitInPlace(spark, dir)
    assert(report === Similarity.RefitReport(0, 2, 0L))
    assert(fileState(dir) === before, "no-op refit must not write anything")
    assertConsistent(dir)
  }

  test("localized drift rewrites only the affected partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinp2").toString
    // four tight clusters; two far-off ones must survive untouched
    // (no cluster at the origin: a zero-norm vector has no cosine and
    // the exactness compare below would divide by zero)
    val centers = Seq((1.0, 0.0, 0.0), (11.0, 0.0, 0.0), (1.0, 40.0, 0.0), (1.0, 0.0, 40.0))
    val base = (0 until 400).map { i =>
      val (cx, cy, cz) = centers(i / 100)
      (i.toLong, Array(cx + 0.001 * (i % 10), cy + 0.001 * (i / 10 % 10), cz))
    }.toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dir, nlist = 4)
    // a blob between the first two clusters: the stale quantizer files
    // it with one of them; the refit centroids shift and some of the
    // blob changes sides
    val blob = (1000 until 1150)
      .map(i => (i.toLong, Array(6.6 + 0.001 * (i % 10), 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    Similarity.ivfAppendToIndex(blob, "vec_id", "embedding", dir)
    val before = fileState(dir)
    val report = Similarity.ivfRefitInPlace(spark, dir)
    info(s"report: $report")
    assert(report.cellsTotal === 4)
    assert(report.rowsMoved > 0, "the blob must move under the refit quantizer")
    assert(report.cellsRewritten < report.cellsTotal,
      "far-off clusters must not be rewritten")
    // partitions outside the rewritten set must be untouched: same
    // files, same mtimes. A dir "changed" if any file was added,
    // removed, or rewritten.
    val after = fileState(dir)
    def dirsOf(m: Map[String, Long]) = m.keys.map(_.split("/")(0)).toSet
    val changedDirs = (dirsOf(before) ++ dirsOf(after)).filter { d =>
      before.filter(_._1.startsWith(d + "/")) != after.filter(_._1.startsWith(d + "/"))
    }
    assert(changedDirs.size <= report.cellsRewritten, s"changed: $changedDirs vs $report")
    val untouched = (dirsOf(before) ++ dirsOf(after)) -- changedDirs
    assert(untouched.nonEmpty, "at least one partition must survive untouched")
    assertConsistent(dir)
    // full probe stays exact
    val all = base.union(blob)
    val queries = all.where($"vec_id".isin(0L, 1000L))
    val fromIndex = Similarity
      .ivfQueryIndex(queries, "vec_id", "embedding", dir, k = 3, nprobe = 4,
        excludeSelfMatch = true) // self-ANN: queries ARE corpus rows
      .orderBy("query_id", "rank").collect().toSeq
    val brute = Similarity
      .bruteForceTopK(queries, all, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(fromIndex === brute)
  }

  test("in-place refit refuses an empty index") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinp3").toString
    intercept[Exception](Similarity.ivfRefitInPlace(spark, dir))
  }
}
