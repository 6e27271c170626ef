package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave produces the textbook Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L)).toDF("x", "y")
    val got = df
      .select(Layout.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long]
      .collect()
      .toSeq
    // morton2(3,5) with x in even bits: x=011, y=101 -> z=100111 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("bucket is an exact affine map onto [0, 2^bits)") {
    val df = (0L to 1000L).toDF("x")
    val got = df
      .select(Layout.bucket(col("x"), lit(0L), lit(1000L), 4).as("b"))
      .as[Long]
      .collect()
    assert(got.min == 0 && got.max == 15)
    // matches the plain JVM formula on every value
    (0L to 1000L).zip(got).foreach { case (x, b) =>
      assert(b == math.floor(x.toDouble * 16 / 1001).toLong)
    }
  }

  test("bucket widens to long before subtracting — full-Int-span columns don't overflow") {
    val df = Seq(Int.MinValue, 0, Int.MaxValue).toDF("x")
    val got = df
      .select(
        Layout
          .bucket(col("x"), lit(Int.MinValue), lit(Int.MaxValue), 4)
          .as("b"))
      .as[Long]
      .collect()
      .toSeq
    // Int.MaxValue - Int.MinValue in int wraps to -1; in long it is
    // 2^32 - 1 and the buckets land monotonically in [0, 16).
    assert(got == Seq(0L, 8L, 15L), s"got $got")
  }

  test("bucket raises on ranges past the 2^(53-bits) double-exactness bound") {
    val df = Seq(0L).toDF("x")
    val err = intercept[Exception] {
      df.select(Layout.bucket(col("x"), lit(0L), lit(1L << 50), 4)).collect()
    }
    assert(err.getMessage.contains("2^49") || err.getCause != null)
    // the flat 2^40 bound missed this: bits=16 with a 2^38 range puts
    // the numerator past 2^53
    val err16 = intercept[Exception] {
      df.select(Layout.bucket(col("x"), lit(0L), lit(1L << 38), 16)).collect()
    }
    assert(err16.getMessage.contains("2^37") || err16.getCause != null)
    // in-bounds widths still bucket fine at the same bits
    val ok = df.select(Layout.bucket(col("x"), lit(0L), lit((1L << 36) - 1), 16)).collect()
    assert(ok.head.getLong(0) == 0L)
  }

  test("z-order layout bounds BOTH dimensions; a single-column sort bounds only one") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 20000).map(_ => (rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val df = rows.toDF("x", "y")
    val chunks = 64
    // per-chunk average span of each dimension under a given ordering —
    // a filter on that dimension skips a chunk iff its span excludes
    // the predicate range, so span/domain ~ fraction of files READ
    def spans(ordered: Seq[(Long, Long)]): (Double, Double) = {
      val gs = ordered.grouped(ordered.size / chunks).toSeq
      (
        gs.map(c => (c.map(_._1).max - c.map(_._1).min).toDouble).sum / gs.size,
        gs.map(c => (c.map(_._2).max - c.map(_._2).min).toDouble).sum / gs.size
      )
    }
    val zOrdered = Layout
      .zorderKeyed(df, Seq("x", "y"), bits = 8)
      .orderBy("zkey")
      .select("x", "y")
      .as[(Long, Long)]
      .collect()
      .toSeq
    val (zx, zy) = spans(zOrdered)
    val (sx, sy) = spans(rows.sortBy(_._1))
    // x-sort: x tight but y spans ~the whole 1024 domain — filters on
    // y skip nothing. z-order: both dims simultaneously bounded.
    assert(sy > 900, s"x-sorted y-span should cover the domain, got $sy")
    assert(zx < 400 && zy < 400, s"z-order spans should bound both dims, got ($zx, $zy)")
    assert(zx.max(zy) < sy / 2, "worst z-order dim must beat the unsorted dim by 2x+")
    info(f"avg spans over 1024 domain: z-order x=$zx%.0f y=$zy%.0f; x-sort x=$sx%.0f y=$sy%.0f")
  }

  test("z-ordered parquet actually skips row groups on a 2-dim range predicate") {
    // The payoff proof: write the SAME data z-ordered vs randomly
    // laid out, read each with a 2-dim range predicate, and compare
    // how many rows the parquet scan MATERIALIZES (scan numOutputRows
    // = rows surviving row-group stats pruning, before Spark's
    // residual filter). Z-order must skip most of the data; the
    // random layout reads ~everything.
    val n = 40000
    val rnd = new scala.util.Random(7)
    val rows = (0 until n).map(_ => (rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val df = rows.toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("zskip").toString
    Layout
      .clusterByZOrder(df, Seq("x", "y"), bits = 8, numPartitions = 64)
      .drop("zkey")
      .write.mode("overwrite").parquet(s"$base/zordered")
    df.repartition(64) // round-robin: every file spans the whole domain
      .write.mode("overwrite").parquet(s"$base/random")

    def scannedRows(dir: String): Long = {
      // collect() on a scan+filter plan (no exchange, so no AQE
      // wrapper) and read the leaf scan's numOutputRows metric
      val q = spark.read
        .parquet(dir)
        .where(col("x") >= 100 && col("x") < 228 && col("y") >= 600 && col("y") < 728)
      val matched = q.collect().length
      // ~ (128/1024)^2 of the domain
      assert(matched > 0 && matched < n / 32)
      q.queryExecution.executedPlan
        .collectLeaves()
        .collect { case s if s.metrics.contains("numOutputRows") => s.metrics("numOutputRows").value }
        .sum
    }
    val zScanned = scannedRows(s"$base/zordered")
    val rScanned = scannedRows(s"$base/random")
    info(s"scan materialized: z-ordered $zScanned rows vs random-layout $rScanned of $n")
    assert(rScanned > n * 9L / 10, s"random layout should read ~everything, read $rScanned")
    assert(
      zScanned < n / 4,
      s"z-ordered layout should row-group-prune most of the data, read $zScanned"
    )
    assert(zScanned * 4 < rScanned, "z-order must beat the random layout by 4x+")
  }

  test("clusterByZOrder keeps rows intact and sorts within partitions") {
    val df = (0 until 5000).map(i => (i.toLong % 97, i.toLong % 89)).toDF("x", "y")
    val out = Layout.clusterByZOrder(df, Seq("x", "y"), bits = 6, numPartitions = 8)
    assert(out.count() == 5000)
    val sortedWithin = out
      .mapPartitions { it =>
        val ks = it.map(_.getAs[Long]("zkey")).toSeq
        Iterator.single(ks == ks.sorted)
      }(org.apache.spark.sql.Encoders.scalaBoolean)
      .collect()
    assert(sortedWithin.forall(identity))
  }
}
