package graft.sources

import graft.SparkSpec
import graft.core.Granularity
import graft.profiler.ProfilingBuilder
import graft.streaming.StreamingProfiler
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("batch source validates and normalizes the event-time column") {
    val df = Sources.batch(spark, "/root/testdata/sf0.001/orders.parquet", "o_orderdate")
    assert(df.schema("o_orderdate").dataType == TimestampType)
    intercept[IllegalArgumentException] {
      Sources.batch(spark, "/root/testdata/sf0.001/orders.parquet", "no_such_column")
    }
  }

  test("csv batch source casts string timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    Seq(("2025-01-01 10:00:00", 1.0), ("2025-01-02 11:00:00", 2.0))
      .toDF("ts", "value")
      .write.option("header", "true").csv(s"$dir/csv")
    val df = Sources.batch(
      spark, s"$dir/csv", "ts",
      format = "csv", options = Map("header" -> "true", "inferSchema" -> "true"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 2)
  }

  test("streaming file source -> profiler -> parquet sink round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    // seed one file before starting the stream
    Seq((java.sql.Timestamp.valueOf("2025-01-01 10:10:00"), 4.0),
        (java.sql.Timestamp.valueOf("2025-01-01 10:20:00"), 6.0))
      .toDF("ts", "value").write.parquet(s"$dir/in")
    val stream = Sources.stream(spark, s"$dir/in", "ts", schema)
    val profiled = StreamingProfiler.profile(
      stream, "ts", ProfilingBuilder.simple, Granularity.Hour, watermark = "0 seconds")
    val q = Sources.metricsSink(profiled, s"$dir/out", s"$dir/chk")
    try {
      q.processAllAvailable()
      // append another file: watermark passes hour 10, its window emits
      Seq((java.sql.Timestamp.valueOf("2025-01-01 12:00:00"), 1.0))
        .toDF("ts", "value").write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      Seq((java.sql.Timestamp.valueOf("2025-01-01 13:00:00"), 1.0))
        .toDF("ts", "value").write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$dir/out")
    val mean = out
      .where($"ts" === to_timestamp(lit("2025-01-01 10:00:00")) && $"name" === "Mean")
      .select("value").as[Double].collect()
    assert(mean.toSeq == Seq(5.0))
  }

  test("schema contract: reports every violation class, enforce projects to contract order") {
    import org.apache.spark.sql.types._
    val expected = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("value", DoubleType),
      StructField("gone", StringType)
    ))
    val df = Seq((1.0f, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), "x"))
      .toDF("value", "ts", "surprise") // value is FLOAT, gone absent, surprise extra
    val v = Sources.validateSchema(df, expected)
    assert(v.map(x => (x.column, x.kind)).toSet ==
      Set(("value", "type_mismatch"), ("gone", "missing"), ("surprise", "unexpected")))
    // allowExtra drops only the unexpected class
    assert(!Sources.validateSchema(df, expected, allowExtra = true)
      .exists(_.kind == "unexpected"))
    val ex = intercept[Sources.SchemaContractException] {
      Sources.enforceSchema(df, expected)
    }
    assert(ex.violations.size == 3)
    // a conforming frame comes back in contract column order
    val ok = Seq(("a", 1.0, java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("gone", "value", "ts")
    assert(Sources.enforceSchema(ok, expected).columns.toSeq == Seq("ts", "value", "gone"))
    // duplicate names surface as their own violation class (a name->
    // type map would hide one and make enforce's select ambiguous)
    val dup = ok.select(col("*"), col("value").cast("int"))
    val dv = Sources.validateSchema(dup, expected)
    assert(dv.exists(v => v.column == "value" && v.kind == "duplicate"))
    intercept[Sources.SchemaContractException] {
      Sources.enforceSchema(dup, expected)
    }
  }

  test("csv batch ingestion honors the explicit schema and event-time contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "ts,value\n2025-01-01 10:00:00,5.0\n2025-01-01 11:00:00,7.0\n"
    )
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", StringType), // deliberately string: batch() must cast
      StructField("value", DoubleType)
    ))
    val df = Sources.batch(
      spark, dir, "ts",
      format = "csv",
      schema = Some(schema),
      options = Map("header" -> "true")
    )
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 2)
  }

  test("jsonl corpus ingest quarantines malformed lines instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "source": "a"}
        |{"doc_id": 2, "text": "second doc", "source": "b"}
        |{"doc_id": 3, "text": "unterminated
        |not json at all
        |{"doc_id": 4, "text": "fourth", "source": "a"}
        |""".stripMargin
    )
    val (clean, bad) = Sources.corpusJsonl(spark, dir)
    assert(clean.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq === Seq(1L, 2L, 4L))
    assert(!clean.columns.contains("_corrupt_record"))
    val rawLines = bad.select("_corrupt_record").collect().map(_.getString(0)).toSeq
    assert(rawLines.length === 2)
    assert(rawLines.exists(_.contains("not json at all")), rawLines.toString)
  }

  test("jsonl corpus ingest with an explicit schema skips inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl2").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/d.jsonl"),
      """{"doc_id": 7, "text": "with schema"}""" + "\n"
    )
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)
    ))
    val (clean, bad) = Sources.corpusJsonl(spark, dir, schema = Some(schema))
    assert(clean.count() === 1 && bad.count() === 0)
    // contract columns must exist — a schema without text fails fast
    intercept[IllegalArgumentException] {
      Sources.corpusJsonl(spark, dir,
        schema = Some(StructType(Seq(StructField("doc_id", LongType)))))
    }
  }

  test("orc round-trips through the format-generic batch source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Seq(("2025-01-01 10:00:00", 1.0), ("2025-01-02 11:00:00", 2.0))
      .toDF("ts_raw", "v")
      .select(to_timestamp($"ts_raw").as("ts"), $"v")
    src.write.mode("overwrite").orc(s"$dir/t")
    val back = Sources.batch(spark, s"$dir/t", "ts", format = "orc")
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.count() == 2)
    assert(back.agg(sum($"v")).as[Double].head() == 3.0)
  }

  test("binaryCorpus ingests media files opaquely; glob prunes, decode kernel works") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img =
        new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x336699)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.png"), png(8, 6))
    java.nio.file.Files.write(dir.resolve("b.png"), png(16, 4))
    java.nio.file.Files.write(dir.resolve("sidecar.json"), "{}".getBytes)
    val media = Sources.binaryCorpus(spark, dir.toString, glob = "*.png")
    assert(media.count() == 2, "glob prunes the sidecar at listing time")
    // the binary frame feeds the decode kernel unchanged
    val feats = graft.multimodal.Multimodal
      .extractFeatures(media, "payload", featureDim = 4)
      .select(col("doc_id"), col("width"), col("decoded"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getInt(1), r.getBoolean(2)))
      .toSet
    assert(feats == Set(("a.png", 8, true), ("b.png", 16, true)))
    // size guard filters, never truncates
    assert(Sources.binaryCorpus(spark, dir.toString, glob = "*.png", maxBytes = 10).count() == 0)
  }
}
