package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")

  test("shard/file/ord assignment is a pure function of (id, salt)") {
    val a = Export
      .shuffleShards(docs(500), "doc_id", 8, filesPerShard = 4)
      .select("doc_id", "shard", "file_no", "ord")
    val b = Export
      .shuffleShards(docs(500).repartition(7).orderBy(rand(42)), "doc_id", 8, filesPerShard = 4)
      .select("doc_id", "shard", "file_no", "ord")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // different salt => different permutation
    val c = Export.shuffleShards(docs(500), "doc_id", 8, 4, salt = "other")
    assert(a.join(c.withColumnRenamed("ord", "ord2"), "doc_id")
      .where(col("ord") === col("ord2")).count() === 0)
  }

  test("shards and files cover their ranges and are roughly balanced") {
    val s = Export.shuffleShards(docs(8000), "doc_id", 8, filesPerShard = 4)
    val counts = s.groupBy("shard").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 8).toSet)
    // uniform 1000/shard expected; 3-sigma ~ +-90
    assert(counts.values.forall(c => c > 700 && c < 1300), counts.toString)
    val files = s.select("file_no").distinct().as[Int].collect().toSet
    assert(files === (0 until 4).toSet)
  }

  test("exportShards writes ord-sorted files whose union is the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Export.exportShards(docs(2000), "doc_id", dir, nShards = 4, filesPerShard = 2)
    val back = spark.read.parquet(dir)
    // lossless: every row exactly once, coordinates intact
    assert(back.count() === 2000)
    assert(back.select("doc_id").distinct().count() === 2000)
    assert(back.select("shard").distinct().count() === 4)
    // per-FILE ordering: within every physical file, ord ascends
    val perFile = back
      .withColumn("_f", input_file_name())
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("_f").orderBy(monotonically_increasing_id())))
    val violations = perFile
      .withColumn("_prev", lag(col("ord"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_f").orderBy("_rn")))
      .where(col("_prev") > col("ord"))
      .count()
    assert(violations === 0, "rows inside a file must ascend by ord")
    // one file per (shard, file_no) cell at this size
    val cells = back.withColumn("_f", input_file_name())
      .groupBy("shard", "file_no").agg(countDistinct("_f").as("nf"))
    assert(cells.where(col("nf") =!= 1).count() === 0)
  }

  test("membership matches the documents-table oracle key at tiny scale") {
    // same arithmetic the pipeline_shuffle_shards oracle runs: recompute
    // shard from the md5 hex by hand for a few ids
    val rows = Export
      .shuffleShards(docs(32), "doc_id", 8, filesPerShard = 4, salt = "shards")
      .select("doc_id", "shard", "file_no", "ord")
      .collect()
    rows.foreach { r =>
      val h = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s"${r.getLong(0)}:shards".getBytes("UTF-8"))
        .map("%02x".format(_))
        .mkString
      val u1 = java.lang.Long.parseLong(h.substring(0, 8), 16)
      val u2 = java.lang.Long.parseLong(h.substring(24, 32), 16)
      assert(r.getInt(1) === math.floor(u1 * 8.0 / 4294967296d).toInt)
      assert(r.getInt(2) === math.floor(u2 * 4.0 / 4294967296d).toInt)
      assert(r.getString(3) === h.substring(8, 24))
    }
  }

  test("curriculum export orders within shards by the column, files by quantile") {
    val dir = java.nio.file.Files.createTempDirectory("curr").toString
    // difficulty = doc_id: percentile boundary at the median
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "difficulty")
    Export.exportShardsCurriculum(df, "doc_id", dir, nShards = 2,
      curriculumCol = "difficulty", filesPerShard = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    // file 0 holds the easy half, file 1 the hard half — in EVERY shard
    val f0max = back.where(col("file_no") === 0).agg(max("difficulty")).head.getDouble(0)
    val f1min = back.where(col("file_no") === 1).agg(min("difficulty")).head.getDouble(0)
    assert(f0max <= f1min, s"file 0 max $f0max must not exceed file 1 min $f1min")
    // within every physical file, difficulty ascends
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_f").orderBy(monotonically_increasing_id())
    val violations = back
      .withColumn("_f", input_file_name())
      .withColumn("_prev", lag(col("difficulty"), 1).over(w))
      .where(col("_prev") > col("difficulty"))
      .count()
    assert(violations === 0, "rows inside a file must ascend by difficulty")
    // shard membership identical to the shuffled export's hash
    val shuffled = Export.shuffleShards(df, "doc_id", 2).select(col("doc_id"), col("shard").as("s2"))
    assert(back.join(shuffled, "doc_id").where(col("shard") =!= col("s2")).count() === 0)
  }

  test("appendShards adds batches under stable shard dirs with hash-pure membership") {
    val dir = java.nio.file.Files.createTempDirectory("appshards").toString
    Export.appendShards(docs(400), "doc_id", dir, nShards = 4, batchId = "2025-01-01")
    Export.appendShards(
      (401 to 800).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"),
      "doc_id", dir, nShards = 4, batchId = "2025-01-02")
    val back = spark.read.parquet(dir)
    assert(back.count() === 800)
    assert(back.select("batch").distinct().count() === 2)
    // membership must match the pure hash regardless of delivering batch
    val expect = Export.shuffleShards(
      (1 to 800).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"),
      "doc_id", 4).select(col("doc_id"), col("shard").as("s2"))
    assert(back.join(expect, "doc_id").where(col("shard") =!= col("s2")).count() === 0)
    // batch dirs nest under (shard, file_no)
    val f = new java.io.File(s"$dir/shard=0/file_no=0")
    assert(f.listFiles().map(_.getName).count(_.startsWith("batch=")) === 2)
    intercept[IllegalArgumentException](
      Export.appendShards(docs(1), "doc_id", dir, 4, batchId = "../evil"))
  }

  test("readShards assigns dense per-shard replay positions in directory order") {
    val dir = java.nio.file.Files.createTempDirectory("readshards").toString
    Export.exportShards(docs(300), "doc_id", dir, nShards = 3, filesPerShard = 2)
    val back = Export.readShards(spark, dir)
    assert(back.count() === 300)
    // positions are dense 1..n within every shard
    val perShard = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"), min("shard_pos").as("mn"))
      .collect()
    assert(perShard.forall(r => r.getAs[Int]("mn") == 1 &&
      r.getAs[Long]("n") == r.getAs[Int]("mx").toLong))
    // position order IS (file_no, ord) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shard_pos"))
    val disordered = back
      .withColumn("_pf", lag(col("file_no"), 1).over(w))
      .withColumn("_po", lag(col("ord"), 1).over(w))
      .where(col("_pf").isNotNull &&
        (col("_pf") > col("file_no") ||
          (col("_pf") === col("file_no") && col("_po") > col("ord"))))
      .count()
    assert(disordered === 0L)
  }

  test("readShards honors curriculum file order via withinFileOrder") {
    val dir = java.nio.file.Files.createTempDirectory("readshards-cur").toString
    val df = (1 to 200)
      .map(i => (i.toLong, s"doc $i", (i * 37 % 100).toDouble))
      .toDF("doc_id", "text", "difficulty")
    Export.exportShardsCurriculum(df, "doc_id", dir, nShards = 2, "difficulty",
      filesPerShard = 2)
    // curriculum files are physically sorted by (difficulty, ord):
    // positions numbered that way never descend in difficulty inside a file
    val back = Export.readShards(spark, dir, withinFileOrder = Seq("difficulty", "ord"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shard_pos"))
    val descents = back
      .withColumn("_pf", lag(col("file_no"), 1).over(w))
      .withColumn("_pd", lag(col("difficulty"), 1).over(w))
      .where(col("_pf") === col("file_no") && col("_pd") > col("difficulty"))
      .count()
    assert(descents === 0L)
  }

  test("readShards is not fooled by a user data column named batch") {
    val dir = java.nio.file.Files.createTempDirectory("readshards-ubatch").toString
    val df = (1 to 100)
      .map(i => (i.toLong, s"doc $i", s"crawl-${i % 3}"))
      .toDF("doc_id", "text", "batch") // user column, NOT the partition level
    Export.exportShards(df, "doc_id", dir, nShards = 2)
    val back = Export.readShards(spark, dir)
    assert(back.count() === 100)
    // order must be (file_no, ord) — numbering by the user batch column
    // first would break ord-monotonicity within files
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shard_pos"))
    val disordered = back
      .withColumn("_pf", lag(col("file_no"), 1).over(w))
      .withColumn("_po", lag(col("ord"), 1).over(w))
      .where(col("_pf") === col("file_no") && col("_po") > col("ord"))
      .count()
    assert(disordered === 0L)
  }

  test("appendShards refuses a flat exportShards layout instead of corrupting it") {
    val dir = java.nio.file.Files.createTempDirectory("appshards-flat").toString
    Export.exportShards(docs(50), "doc_id", dir, nShards = 2)
    val e = intercept[IllegalArgumentException](
      Export.appendShards(docs(10), "doc_id", dir, nShards = 2, batchId = "b01"))
    assert(e.getMessage.contains("flat exportShards layout"))
  }

  test("readShards replays appended batches after earlier ones within a cell") {
    val dir = java.nio.file.Files.createTempDirectory("readshards-app").toString
    assert(Export.appendShards(docs(100), "doc_id", dir, nShards = 2, batchId = "b01"))
    assert(Export.appendShards(
      (101 to 200).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"),
      "doc_id", dir, nShards = 2, batchId = "b02"))
    val back = Export.readShards(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shard_pos"))
    // within a (shard, file_no) run, batch never decreases with position
    val regressions = back
      .withColumn("_pf", lag(col("file_no"), 1).over(w))
      .withColumn("_pb", lag(col("batch"), 1).over(w))
      .where(col("_pf") === col("file_no") && col("_pb") > col("batch"))
      .count()
    assert(regressions === 0L)
    assert(back.count() === 200)
  }

  test("readShards detects the append layout from segments BELOW the dir, not the full path") {
    // a flat exportShards tree NESTED under an unrelated "batch=…"
    // parent must NOT be misread as an append layout (which would
    // order by a `batch` column that does not exist)
    val parent = java.nio.file.Files.createTempDirectory("batchparent").toString
    val dir = s"$parent/batch=2026-01-01/shards"
    Export.exportShards(docs(50), "doc_id", dir, nShards = 2)
    val back = Export.readShards(spark, dir)
    assert(!back.columns.contains("batch"))
    assert(back.count() === 50)
    // and '.'/'..' batch ids are refused (the marker would normalize
    // to the output dir itself and silently skip every append)
    val dir2 = java.nio.file.Files.createTempDirectory("appdots").toString
    intercept[IllegalArgumentException] {
      Export.appendShards(docs(10), "doc_id", dir2, nShards = 2, batchId = "..")
    }
  }

  test("appendShards is write-once per batch id — a reused id is a committed no-op") {
    val dir = java.nio.file.Files.createTempDirectory("appshards-once").toString
    assert(Export.appendShards(docs(100), "doc_id", dir, nShards = 2, batchId = "b01"))
    val firstFiles = spark.read.parquet(dir).inputFiles.sorted.toSeq
    // reusing the id must write NOTHING: in append mode it would
    // interleave part files inside the same batch leaves and break
    // deterministic replay
    assert(!Export.appendShards(docs(100), "doc_id", dir, nShards = 2, batchId = "b01"))
    assert(spark.read.parquet(dir).inputFiles.sorted.toSeq === firstFiles)
    assert(spark.read.parquet(dir).count() === 100)
    // a crashed attempt (leaves on disk, no marker) is cleaned and rewritten
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_batches/b02"), false)
      : Unit // ensure absent
    assert(Export.appendShards(docs(150), "doc_id", dir, nShards = 2, batchId = "b02"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_batches/b02"), false)
    assert(Export.appendShards(docs(150), "doc_id", dir, nShards = 2, batchId = "b02"),
      "retry after crash (no marker) must rewrite the batch")
    assert(spark.read.parquet(dir).where(col("batch") === "b02").count() === 150)
    assert(spark.read.parquet(dir).count() === 250)
  }

  test("shard assignment is a scan-side projection — no exchange in the plan") {
    val plan = Export
      .shuffleShards(docs(100), "doc_id", 8, filesPerShard = 4)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("shard assignment is streaming-safe — writeStream partitions by the same hash") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("streamshards").toString
    val ckpt = java.nio.file.Files.createTempDirectory("streamshards-ckpt").toString
    // a pure projection needs no watermark, no state, no output mode
    // gymnastics: the same assignment runs per micro-batch
    val query = Export
      .shuffleShards(input.toDF().toDF("doc_id", "text"), "doc_id", 4)
      .writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .partitionBy("shard")
      .start()
    try {
      input.addData((1 to 200).map(i => (i.toLong, s"doc $i")): _*)
      query.processAllAvailable()
      input.addData((201 to 400).map(i => (i.toLong, s"doc $i")): _*)
      query.processAllAvailable()
    } finally query.stop()
    val back = spark.read.parquet(dir)
    assert(back.count() === 400)
    val expect = Export
      .shuffleShards(docs(400), "doc_id", 4)
      .select(col("doc_id"), col("shard").as("s2"))
    assert(back.join(expect, "doc_id").where(col("shard") =!= col("s2")).count() === 0)
  }

  test("invalid shard counts are rejected") {
    intercept[IllegalArgumentException](Export.shuffleShards(docs(1), "doc_id", 0))
    intercept[IllegalArgumentException](Export.shuffleShards(docs(1), "doc_id", 4, 0))
    // product overflow: both args individually valid
    intercept[IllegalArgumentException](
      Export.exportShards(docs(1), "doc_id", "/tmp/never", 1 << 20, 1 << 20)
    )
  }
}
