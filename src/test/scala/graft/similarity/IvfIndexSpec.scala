package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted IVF index: fit-once reuse and the partition-pruning
  * payoff — a probe must READ only its probed cell directories, not
  * the whole corpus (the I/O-side scale claim of the cell-partitioned
  * layout).
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters, 200 vectors each
  private def clustered = (
    (0 until 200).map(i => (i.toLong, Array(10.0 + i * 0.01, 0.1 * (i % 5), 0.0))) ++
      (200 until 400).map(i => (i.toLong, Array(0.0, 10.0 + i * 0.01, 0.1 * (i % 5))))
  ).toDF("vec_id", "embedding")

  test("ivfQueryIndex matches ivfTopK (same fit, same probes)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val corpus = clustered
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", dir, nlist = 4)
    val queries = corpus.where($"vec_id".isin(0L, 250L))
    val fromIndex = Similarity
      .ivfQueryIndex(queries, "vec_id", "embedding", dir, k = 5, nprobe = 2,
        excludeSelfMatch = true) // self-ANN: queries ARE corpus rows
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val live = Similarity
      .ivfTopK(queries, corpus, "vec_id", "embedding", k = 5, nlist = 4, nprobe = 2)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    assert(fromIndex === live)
  }

  test("an external query id colliding with an unrelated corpus id still gets that neighbor") {
    // r7 ADVICE defect: the shared probe tail unconditionally dropped
    // query_id == neighbor_id, so an EXTERNAL query set reusing id 0
    // silently lost corpus row 0 even when it was the true nearest
    // neighbor. ivfQueryIndex now defaults excludeSelfMatch = false.
    val dir = java.nio.file.Files.createTempDirectory("ivfidx-collide").toString
    Similarity.ivfWriteIndex(clustered, "vec_id", "embedding", dir, nlist = 4)
    // external query: same id as corpus row 0, vector aimed straight at
    // corpus row 0's direction (10, 0, 0) — row 0 is a cosine-1.0 match
    val external = Seq((0L, Array(20.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity
      .ivfQueryIndex(external, "vec_id", "embedding", dir, k = 5, nprobe = 2)
      .select("neighbor_id").as[Long].collect()
    assert(out.contains(0L), s"corpus row 0 suppressed by id collision: ${out.toSeq}")
    // and the self-ANN flavor still excludes the genuine self-row
    val self = Similarity
      .ivfQueryIndex(clustered.where($"vec_id" === 0L), "vec_id", "embedding",
        dir, k = 5, nprobe = 2, excludeSelfMatch = true)
      .select("neighbor_id").as[Long].collect()
    assert(!self.contains(0L))
  }

  test("a probe scans only the probed cell partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    val corpus = clustered
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", dir, nlist = 8)
    // one query from one cluster, probing 1 cell: the opposite
    // cluster's partitions must never be materialized
    val queries = corpus.where($"vec_id" === 0L)
    val out = Similarity.ivfQueryIndex(queries, "vec_id", "embedding", dir, k = 3, nprobe = 1)
    assert(out.collect().nonEmpty)
    // 1) the probe query itself plans a non-empty partition filter on
    //    the cell column (the literal IN from the collected probes)
    val planStr = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scanLine = planStr.linesIterator
      .find(l => l.contains("/cells") && l.contains("PartitionFilters"))
      .getOrElse(fail(s"no partitioned cells scan in plan:\n$planStr"))
    assert(
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(scanLine).isDefined,
      s"cells scan has an empty partition filter: $scanLine"
    )
    // 2) the layout delivers the I/O: a single-cell scan materializes
    //    only that directory's rows (AQE-free plan so the leaf metric
    //    is readable — same technique as LayoutSpec)
    val oneCell = spark.read.parquet(s"$dir/cells").where(col("cell") === 0)
    val cellRows = oneCell.collect().length
    val scanned = oneCell.queryExecution.executedPlan
      .collectLeaves()
      .collect {
        case s if s.metrics.contains("numOutputRows") => s.metrics("numOutputRows").value
      }
      .sum
    info(s"cell-0 scan materialized $scanned rows of 400 (cell size $cellRows)")
    assert(scanned == cellRows && scanned > 0 && scanned < 200,
      s"partition pruning failed: scanned $scanned of 400 rows for one cell")
  }

  test("appended documents are probed immediately with the stored quantizer") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx4").toString
    val corpus = clustered
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", dir, nlist = 4)
    // a new doc exactly collinear with query 0 (several corpus docs
    // tie at cosine 1.0; rank ties break by ascending id, so the
    // newcomer's id sits below every corpus id) — after append it
    // must take over the top rank for that query
    val newcomer = Seq((-1L, Array(10.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" === 0L)
    val before = Similarity
      .ivfQueryIndex(queries, "vec_id", "embedding", dir, k = 1, nprobe = 1)
      .select("neighbor_id").as[Long].head()
    Similarity.ivfAppendToIndex(newcomer, "vec_id", "embedding", dir)
    val after = Similarity
      .ivfQueryIndex(queries, "vec_id", "embedding", dir, k = 1, nprobe = 1)
      .select("neighbor_id").as[Long].head()
    assert(before !== -1L)
    assert(after === -1L)
  }

  test("compaction collapses append-fragmented cells without changing results") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx5").toString
    val corpus = clustered
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", dir, nlist = 4)
    // fragment: five append batches
    (1 to 5).foreach { b =>
      Similarity.ivfAppendToIndex(
        Seq((1000L + b, Array(10.0 + b * 0.001, 0.0, 0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dir)
    }
    val queries = corpus.where($"vec_id" === 0L)
    def results() = Similarity
      .ivfQueryIndex(queries, "vec_id", "embedding", dir, k = 10, nprobe = 2)
      .orderBy("rank").collect().toSeq
    def nFiles() = spark.read.parquet(s"$dir/cells").inputFiles.length
    val before = results()
    val filesBefore = nFiles()
    Similarity.ivfCompactIndex(spark, dir)
    val after = results()
    val filesAfter = nFiles()
    info(s"cell files: $filesBefore -> $filesAfter")
    assert(after === before, "compaction must not change probe results")
    assert(filesAfter < filesBefore, "compaction must reduce the file count")
  }

  test("index stats account every vector once per cell") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx7").toString
    Similarity.ivfWriteIndex(clustered, "vec_id", "embedding", dir, nlist = 4)
    val stats = Similarity.ivfIndexStats(spark, dir)
      .as[(Int, Long)].collect()
    assert(stats.map(_._2).sum === 400L)
    assert(stats.forall(_._2 > 0))
  }

  test("index meta validates integrity; a corrupted centroid table fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx6").toString
    Similarity.ivfWriteIndex(clustered, "vec_id", "embedding", dir, nlist = 4)
    val meta = spark.read.parquet(s"$dir/meta").head
    assert(meta.getAs[Int]("nlist") === 4 && meta.getAs[Int]("dim") === 3)
    // corrupt: drop a centroid row behind the meta's back
    spark.read.parquet(s"$dir/centroids").where($"cell" =!= 0)
      .write.mode("overwrite").parquet(s"$dir/centroids2")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/centroids"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/centroids2"),
      new org.apache.hadoop.fs.Path(s"$dir/centroids"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfQueryIndex(
        clustered.where($"vec_id" === 0L), "vec_id", "embedding", dir, k = 1)
    }
    assert(e.getMessage.contains("corrupt IVF index"))
  }

  test("append drift triggers the refit signal; refit rebalances and stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx8").toString
    // initial corpus: four tight, well-separated subclusters of 100 —
    // the evenly-spaced init lands one centroid per subcluster, so the
    // fresh index is genuinely balanced (100/100/100/100)
    val centersA = Seq((10.0, 0.0), (0.0, 10.0), (10.0, 10.0), (20.0, 0.0))
    val regionA = (0 until 400)
      .map { i =>
        val (cx, cy) = centersA(i / 100)
        (i.toLong, Array(cx + 0.001 * (i % 10), cy + 0.001 * (i / 10 % 10), 0.0))
      }
      .toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(regionA, "vec_id", "embedding", dir, nlist = 4)
    assert(!Similarity.ivfRefitNeeded(spark, dir, factor = 2.0),
      "a freshly fit index must not demand a refit")
    // drift: a new domain 3x the original size — every vector lands in
    // whichever old cell happens to be nearest, piling up one cell
    val regionB = (1000 until 2200)
      .map(i => (i.toLong, Array(0.0, 0.1 * (i % 7), 50.0 + 0.01 * (i % 30))))
      .toDF("vec_id", "embedding")
    Similarity.ivfAppendToIndex(regionB, "vec_id", "embedding", dir)
    def shares() = Similarity.ivfIndexStats(spark, dir)
      .where($"cell".isNotNull)
      .select($"n_vectors".cast("long")).as[Long].collect()
    val before = shares()
    assert(Similarity.ivfRefitNeeded(spark, dir, factor = 2.0),
      s"drifted index must trigger the signal (cells ${before.mkString(",")})")
    Similarity.ivfRefitIndex(spark, dir)
    val after = shares()
    info(s"cell sizes: before ${before.sorted.mkString(",")} -> after ${after.sorted.mkString(",")}")
    assert(after.sum === 1600L, "refit must keep every vector")
    assert(after.max < before.max, "refit must shrink the dominant cell")
    assert(!Similarity.ivfRefitNeeded(spark, dir, factor = 2.0),
      s"refit index still triggers (cells ${after.mkString(",")})")
    // a full probe (nprobe = nlist) over the refit index is EXACT —
    // refit changed the layout, never the answers
    val all = regionA.union(regionB)
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

  test("refit can resize the quantizer; meta and centroids follow") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx9").toString
    Similarity.ivfWriteIndex(clustered, "vec_id", "embedding", dir, nlist = 4)
    Similarity.ivfRefitIndex(spark, dir, nlist = Some(8))
    val meta = spark.read.parquet(s"$dir/meta").head
    assert(meta.getAs[Int]("nlist") === 8 && meta.getAs[Int]("dim") === 3)
    assert(spark.read.parquet(s"$dir/centroids").count() === 8L)
    val stats = Similarity.ivfIndexStats(spark, dir).as[(Int, Long)].collect()
    assert(stats.map(_._2).sum === 400L)
  }

  test("dirty vectors land in the null partition and are never returned") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx3").toString
    val dirty = clustered
      .union(Seq((999L, null.asInstanceOf[Array[Double]])).toDF("vec_id", "embedding"))
    Similarity.ivfWriteIndex(dirty, "vec_id", "embedding", dir, nlist = 4)
    val out = Similarity
      .ivfQueryIndex(clustered.where($"vec_id" === 0L), "vec_id", "embedding", dir, k = 400, nprobe = 4)
      .select("neighbor_id")
      .as[Long]
      .collect()
    assert(!out.contains(999L))
  }
}
