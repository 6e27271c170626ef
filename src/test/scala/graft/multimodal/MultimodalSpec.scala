package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "abcdefgh" * 100), // 800 bytes
    (2L, "xy"), // 2 bytes
    (3L, "q" * 256) // exactly one frame
  ).toDF("id", "payload_str")
    .withColumn("payload", encode($"payload_str", "UTF-8"))
    .drop("payload_str")

  test("withMeta computes size and content hash without touching payload bytes") {
    val out = Multimodal.withMeta(media, "payload", "application/octet-stream")
    val metas = out.select($"id", $"meta.n_bytes", $"meta.media_type", $"meta.content_hash").collect()
    val byId = metas.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byId(1L) == ((800L, "application/octet-stream")))
    assert(byId(2L)._1 == 2L)
    // identical payloads hash identically
    val h = Multimodal.withMeta(media.unionByName(media), "payload", "m")
      .groupBy("id").agg(countDistinct($"meta.content_hash").as("n")).collect()
    assert(h.forall(_.getAs[Long]("n") == 1L))
  }

  test("extractFeatures preserves input columns, adds deterministic feature batch output") {
    val out = Multimodal.extractFeatures(media, "payload", featureDim = 4, batchSize = 2)
    assert(out.columns.toSeq == Seq("id", "payload", "width", "height", "decoded", "feature"))
    val rows = out.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 80)
      assert(r.getAs[scala.collection.Seq[Float]]("feature").length == 4)
    }
    // deterministic across runs (project out the binary payload —
    // Array[Byte] compares by reference)
    def key(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[scala.collection.Seq[Float]]("feature").toList))
      .sortBy(_._1)
      .toSeq
    val again = Multimodal.extractFeatures(media, "payload", featureDim = 4, batchSize = 2).collect()
    assert(key(rows) == key(again))
  }

  test("perceptual average-hash: identical payloads at Hamming 0, perturbed ones nearby") {
    import org.apache.spark.sql.functions.encode
    val base = ("x" * 50) + ("A" * 400) + ("z" * 50) // structured bytes
    val docs = Seq(
      (1L, base),
      (2L, base),                            // identical -> hamming 0
      (3L, base.replace("AAAA", "AABA")),    // tiny local edit -> small hamming
      (4L, scala.util.Random.javaRandomToRandom(new java.util.Random(7)).alphanumeric.take(500).mkString)
    ).toDF("id", "text").withColumn("payload", encode($"text", "UTF-8"))
    val sigs = Multimodal.averageHash60(docs, "payload", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val nearHamming = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(nearHamming <= 8, s"near-dup hamming $nearHamming")
    val pairs = Multimodal.phashPairs(docs, "payload", "id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("image payloads decode for real: true dimensions, luma features, pixel phash pairs") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img =
        new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val base = png(32, 20, (x, _) => gray(x * 255 / 31)) // dark->bright gradient
    val near = png(32, 20, (x, y) => gray(math.min(255, x * 255 / 31 + ((x + y) % 3))))
    val far = png(32, 20, (x, _) => gray(255 - x * 255 / 31)) // inverted
    val imgs = Seq(
      (1L, base),
      (2L, near),
      (3L, far),
      (4L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val feats = Multimodal
      .extractFeatures(imgs, "payload", featureDim = 8)
      .collect()
      .map(r => r.getAs[Long]("id") -> r)
      .toMap
    // real dimensions from the PNG header, not byte-derived surrogates
    assert(feats(1L).getAs[Int]("width") == 32 && feats(1L).getAs[Int]("height") == 20)
    assert(feats(1L).getAs[Boolean]("decoded"))
    assert(!feats(4L).getAs[Boolean]("decoded")) // fallback path flagged
    // luma features see the gradient: leftmost cell darker than rightmost
    // in the first grid row (row-major cells)
    val f1 = feats(1L).getAs[scala.collection.Seq[Float]]("feature")
    assert(f1.head < f1(2), s"expected left<right luma, got $f1")
    // pixel-space phash: the jittered gradient pairs with the original,
    // the inverted one is ~maximally distant; non-images are dropped
    val sigIds = Multimodal
      .decodedAHash60(imgs, "payload", "id")
      .collect()
      .map(_.getAs[Long]("id"))
      .toSet
    assert(sigIds == Set(1L, 2L, 3L))
    val pairs = Multimodal
      .decodedPhashPairs(imgs, "payload", "id", maxHamming = 8)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L)), s"near-dup images should pair, got ${pairs.toSeq}")
    assert(!pairs.contains((1L, 3L)), "inverted image must not pair with the original")
  }

  test("resizeImages produces decodable PNGs at the target dims, passes non-images through") {
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img =
        new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val src = png(32, 20, (x, _) => ((x * 255 / 31) << 16) | 0x30)
    val rows = Seq((1L, src), (2L, "not an image".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal
      .resizeImages(rows, "payload", width = 8, height = 8)
      .collect()
      .map(r => r.getAs[Long]("id") -> r)
      .toMap
    assert(out(1L).getAs[Boolean]("was_resized"))
    val resized = Multimodal.readImage(out(1L).getAs[Array[Byte]]("resized")).get
    assert(resized.getWidth == 8 && resized.getHeight == 8)
    // nearest-neighbor: output pixel (x,0) carries source pixel (x*32/8, 0)
    val expectedLeft = ((0 * 255 / 31) << 16) | 0x30
    assert((resized.getRGB(0, 0) & 0xffffff) == expectedLeft)
    val expectedRight = ((28 * 255 / 31) << 16) | 0x30
    assert((resized.getRGB(7, 0) & 0xffffff) == expectedRight)
    // non-images pass through with NULL resized bytes and the flag false
    assert(!out(2L).getAs[Boolean]("was_resized"))
    assert(out(2L).getAs[Array[Byte]]("resized") == null)
    // resized output feeds the pixel phash path directly
    val sigs = Multimodal
      .decodedAHash60(
        Multimodal.resizeImages(rows, "payload", 20, 12).where($"was_resized"),
        "resized",
        "id")
      .collect()
    assert(sigs.length == 1)
  }

  test("sampleFrames chunk/stride arithmetic") {
    val out = Multimodal
      .sampleFrames(media, "payload", frameBytes = 256, stride = 2)
      .select($"id", $"frame_idx", length($"frame").as("len"))
      .collect()
      .groupBy(_.getLong(0))
    // id=1: 800 bytes -> frames 0,1,2 (floor(800/256)=3), stride 2 -> idx 0,2
    val f1 = out(1L).map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(f1.toSeq == Seq((0, 256), (2, 256)))
    // id=2: payload shorter than one frame -> NO rows (not a truncated
    // partial slice)
    assert(!out.contains(2L))
    // id=3: exactly 256 bytes -> one full frame
    val f3 = out(3L).map(r => (r.getInt(1), r.getInt(2)))
    assert(f3.toSeq == Seq((0, 256)))
  }

  test("imageMeta reads real PNG dims scan-side; JPEG detected without dims") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img =
        new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val jpegish = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00).map(_.toByte)
    val df = Seq(
      (1L, png(37, 21)),
      (2L, jpegish),
      (3L, "plain text".getBytes("ASCII")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val got = Multimodal
      .imageMeta(df, "payload")
      .select($"id", $"image.container", $"image.width", $"image.height")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got(1L) == ((Some("png"), 37L, 21L)), s"real PNG dims, got ${got(1L)}")
    assert(got(2L) == ((Some("jpeg"), -1L, -1L)), "JPEG detected, dims deferred to the kernel")
    assert(got(3L)._1.isEmpty && got(4L)._1.isEmpty)
  }

  test("wavMeta parses a real canonical PCM header; junk is flagged, not guessed") {
    // hand-built canonical 44-byte header: 2ch, 44100 Hz, 16-bit, 8 data bytes
    def le(x: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((x >> (8 * i)) & 0xff).toByte).toArray
    val data = Array.tabulate[Byte](8)(_.toByte)
    val wav = "RIFF".getBytes("ASCII") ++ le(36 + 8, 4) ++
      "WAVEfmt ".getBytes("ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(2, 2) ++
      le(44100, 4) ++ le(44100L * 2 * 2, 4) ++ le(4, 2) ++ le(16, 2) ++
      "data".getBytes("ASCII") ++ le(8, 4) ++ data
    val df = Seq(
      (1L, wav),
      (2L, "nonsense bytes".getBytes("ASCII")), // not RIFF
      (3L, wav.take(30)), // truncated mid-header
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val got = Multimodal
      .wavMeta(df, "payload")
      .select(
        $"id", $"wav.canonical", $"wav.channels", $"wav.sample_rate",
        $"wav.bits_per_sample", $"wav.data_bytes", $"wav.duration_sec"
      )
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    val ok = got(1L)
    assert(ok.getBoolean(1))
    assert(ok.getLong(2) == 2L && ok.getLong(3) == 44100L && ok.getLong(4) == 16L)
    assert(ok.getLong(5) == 8L)
    // 8 bytes / (44100 * 2 ch * 2 B) = 4.5351e-5 -> round6 = 0.000045
    assert(ok.getDouble(6) == 0.000045)
    Seq(2L, 3L, 4L).foreach { id =>
      assert(!got(id).getBoolean(1), s"id=$id must not parse")
      assert(got(id).isNullAt(2) && got(id).isNullAt(6))
    }
  }

  test("wavPcmStats: hand-computed sample statistics; junk/short data flagged NULL") {
    def le(x: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((x >> (8 * i)) & 0xff).toByte).toArray
    def wav(samples: Seq[Int], declaredBytes: Option[Int] = None): Array[Byte] = {
      val data = samples.flatMap(s => le(s.toLong & 0xffffL, 2)).toArray
      val db = declaredBytes.getOrElse(data.length)
      "RIFF".getBytes("ASCII") ++ le(36L + db, 4) ++
        "WAVEfmt ".getBytes("ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++
        le(8000, 4) ++ le(16000, 4) ++ le(2, 2) ++ le(16, 2) ++
        "data".getBytes("ASCII") ++ le(db.toLong, 4) ++ data
    }
    // samples: 0, 100, -32768, 32767, 328, -327
    //   peak = 32768/32768 = 1.0
    //   sumSq = 0 + 10000 + 2^30 + 32767^2 + 328^2 + 327^2
    //   clip = {-32768, 32767} -> 2/6; silence (|s|<=327) = {0,100,-327} -> 3/6
    val s6 = Seq(0, 100, -32768, 32767, 328, -327)
    val sumSq = s6.map(s => s.toLong * s).sum
    val rms = math.sqrt(sumSq.toDouble / 6) / 32768.0
    val df = Seq(
      (1L, wav(s6)),
      (2L, wav(Seq(5, -5, 6))), // all-silent, odd trailing declared fine
      (3L, "not a wav".getBytes("ASCII")),
      // declared 100 data bytes but only 4 present -> clamp to 2 samples
      (4L, wav(Seq(1000, -1000), declaredBytes = Some(100)).take(48)),
      (5L, wav(Nil)) // canonical but empty data -> NULL stats
    ).toDF("id", "payload")
    val got = Multimodal
      .wavPcmStats(df, "payload")
      .select(
        $"id", $"wav_stats.n_samples", $"wav_stats.peak", $"wav_stats.rms",
        $"wav_stats.clip_frac", $"wav_stats.silence_frac"
      )
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    val a = got(1L)
    assert(a.getLong(1) == 6L)
    assert(a.getDouble(2) == 1.0)
    assert(math.abs(a.getDouble(3) - rms) < 1e-12)
    assert(math.abs(a.getDouble(4) - 2.0 / 6) < 1e-12)
    assert(math.abs(a.getDouble(5) - 3.0 / 6) < 1e-12)
    val b = got(2L)
    assert(b.getLong(1) == 3L && b.getDouble(5) == 1.0 && b.getDouble(4) == 0.0)
    val clamped = got(4L)
    assert(clamped.getLong(1) == 2L)
    assert(clamped.getDouble(2) == 1000.0 / 32768.0)
    Seq(3L, 5L).foreach { id =>
      assert(got(id).isNullAt(1) && got(id).isNullAt(3), s"id=$id must be NULL")
    }
  }
}
