package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.7).
  *
  * Media (image/audio/video) travels through the pipeline as an opaque
  * `binary` column plus a typed metadata struct — the engine never
  * interprets the bytes except inside an explicit decode kernel.
  *
  * IMAGE payloads decode for real: the kernels route PNG/JPEG/GIF/BMP
  * bytes through the JDK's built-in `javax.imageio` (no external
  * codec dependency), yielding true dimensions, luma features and
  * perceptual hashes. Bytes no installed reader accepts fall back to
  * a DETERMINISTIC byte-derived surrogate (marked `// FALLBACK:`) so
  * audio/video payloads — whose codecs the JDK does not ship — keep
  * flowing through the same plumbing with stable test values.
  */
object Multimodal {

  /** ImageIO's default scratch-file cache costs a disk round-trip per
    * decode — executor kernels want pure in-memory decoding.
    */
  private lazy val imageioConfigured: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Decode image bytes via the JDK's ImageIO; None when `bytes` is
    * null/empty or no installed reader recognizes the format.
    */
  private[multimodal] def readImage(
      bytes: Array[Byte]
  ): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else {
      imageioConfigured
      val in = new java.io.ByteArrayInputStream(bytes)
      try Option(javax.imageio.ImageIO.read(in))
      catch { case scala.util.control.NonFatal(_) => None }
      finally in.close()
    }

  /** Rescale to exactly (w x h) and return per-cell luma (ITU-R BT.601
    * integer weights, 0..255). Deterministic: nearest-neighbor sampling
    * by explicit pixel arithmetic, no Graphics2D filtering involved.
    */
  private[multimodal] def lumaGrid(
      img: java.awt.image.BufferedImage,
      w: Int,
      h: Int
  ): Array[Int] = {
    val out = new Array[Int](w * h)
    var cy = 0
    while (cy < h) {
      val sy = (cy.toLong * img.getHeight / h).toInt
      var cx = 0
      while (cx < w) {
        val sx = (cx.toLong * img.getWidth / w).toInt
        val rgb = img.getRGB(sx, sy)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        out(cy * w + cx) = (299 * r + 587 * g + 114 * b) / 1000
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Typed metadata carried beside the raw bytes. */
  val metaSchema: StructType = StructType(
    Seq(
      StructField("media_type", StringType),
      StructField("n_bytes", LongType),
      StructField("content_hash", LongType)
    )
  )

  /** Wrap a binary column into (payload, meta). Pure column expressions
    * — the scan computes size + hash without materializing copies.
    */
  def withMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn(
      "meta",
      struct(
        lit(mediaType).as("media_type"),
        length(col(binCol)).cast("long").as("n_bytes"),
        xxhash64(col(binCol)).as("content_hash")
      )
    )

  /** Decoded-frame features. `decoded` records whether the payload went
    * through a real image decode or the byte-derived fallback.
    */
  val featureSchema: StructType = StructType(
    Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("decoded", BooleanType),
      StructField("feature", ArrayType(FloatType))
    )
  )

  /** Batched feature extraction over the binary payload.
    *
    * Plumbing is the production shape: one kernel call per PARTITION
    * (not per row) so a real decoder amortizes model/codec setup, with
    * `batchSize` bounding peak memory per executor thread. Partition
    * sizing upstream (`spark.sql.files.maxPartitionBytes`) bounds how
    * many media blobs co-reside in one task.
    *
    * Image payloads (PNG/JPEG/GIF/BMP) DECODE FOR REAL via the JDK's
    * ImageIO: width/height are the true pixel dimensions and the
    * feature vector is the luma (0..1) of `featureDim` equal image
    * cells in row-major order — a real, comparable embedding of the
    * picture. Undecodable payloads take the deterministic fallback.
    */
  def extractFeatures(
      df: DataFrame,
      binCol: String,
      featureDim: Int = 8,
      batchSize: Int = 64
  ): DataFrame = {
    val inputSchema = df.schema
    val binIdx = inputSchema.fieldIndex(binCol)
    val outSchema = StructType(inputSchema.fields ++ featureSchema.fields)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    // exactly featureDim cells, as close to square as its divisors
    // allow (8 -> 4x2, 9 -> 3x3, 12 -> 4x3; primes degrade to a 1-row
    // strip) — every computed cell lands in the feature, none dropped
    val gw = (math.sqrt(featureDim.toDouble).ceil.toInt to featureDim)
      .find(featureDim % _ == 0)
      .getOrElse(featureDim)
    val gh = featureDim / gw
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          readImage(bytes) match {
            case Some(img) =>
              val grid = lumaGrid(img, gw, gh)
              val feature = Array.tabulate(featureDim)(j => grid(j) / 255.0f)
              Row.fromSeq(
                row.toSeq ++ Seq(img.getWidth, img.getHeight, true, feature))
            case None =>
              // FALLBACK: deterministic byte-derived surrogate for
              // payloads with no JDK codec (audio/video/unknown) —
              // preserves the data flow and output shape.
              val n = if (bytes == null) 0 else bytes.length
              val width = 16 + (math.abs(java.util.Arrays.hashCode(bytes)) % 64)
              val height = 16 + (n % 64)
              val feature = Array.tabulate(featureDim) { j =>
                if (n == 0) 0.0f
                else bytes(j % n).toFloat / 128.0f
              }
              Row.fromSeq(row.toSeq ++ Seq(width, height, false, feature))
          }
        }
      }
    }(encoder)
  }

  /** Frame sampling over a "video" payload: emit every `stride`-th
    * fixed-size chunk as its own row (payload, frame_idx, frame_bytes).
    * The chunking arithmetic is the real plumbing; a real
    * implementation replaces byte-slicing with codec frame extraction.
    */
  def sampleFrames(
      df: DataFrame,
      binCol: String,
      frameBytes: Int = 256,
      stride: Int = 4
  ): DataFrame = {
    val nFrames = floor(length(col(binCol)).cast("double") / frameBytes).cast("int")
    df.withColumn(
      "frame_idx",
      // a payload shorter than one frame yields NO rows (explode of an
      // empty sequence), not a truncated partial frame
      explode(
        when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(lit(Array.empty[Int]))
      )
    ).withColumn(
      "frame",
      // STUB: byte-range slice stands in for codec frame decode.
      col(binCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
    )
  }

  /** 60-bit average-hash perceptual signature `(id, sig)` over a
    * binary payload: 60 evenly spaced payload bytes are sampled and
    * bit i is set iff sample i exceeds the sample mean — the aHash
    * construction, with evenly-spaced raw bytes standing in for the
    * decoded 8x8 luma grid (STUB decode, real signature/pairing
    * plumbing; swap the byte sampler for a decoder+downscale kernel to
    * get true pHash). Similar payloads produce nearby signatures, so
    * near-duplicate media pairs come out of the same pigeonhole
    * chunk-join used for text simhash
    * ([[graft.dedup.PortableDedup.hammingPairs60]]) — never all-pairs.
    *
    * Cross-engine portable: byte access goes through `hex(payload)`
    * (identical uppercase hex in Spark and DuckDB), so the whole
    * pipeline is oracle-checkable. Empty payloads yield NULL.
    */
  def averageHash60(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val n = length(col(binCol)) // byte length of binary
    val hx = hex(col(binCol))
    // three explicit projection stages: inlining the mean into all 60
    // bit expressions would square the expression-tree size
    val bytes = (0 until 60).map { i =>
      val byteIdx = floor((lit(i) * col("_n")) / 60.0).cast("int")
      conv(col("_hx").substr(byteIdx * 2 + 1, lit(2)), 16, 10).cast("int").as(s"_b$i")
    }
    val mean = ((0 until 60).map(i => col(s"_b$i")).reduce(_ + _) / 60.0).as("_mean")
    val sig = (0 until 60)
      .map(i => when(col(s"_b$i") > col("_mean"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    // spread: the hex + 60-sample byte walk is the dominant scan-side
    // cost; serial-scan guard (no-op on parallel inputs)
    graft.functions
      .spread(df)
      .select(col(idCol).as("id"), n.as("_n"), hx.as("_hx"))
      .where(col("_n") > 0)
      .select(col("id") +: bytes: _*)
      .select(col("id") +: mean +: (0 until 60).map(i => col(s"_b$i")): _*)
      .select(col("id"), sig.as("sig"))
  }

  /** Perceptual near-duplicate media pairs: average-hash signatures +
    * pigeonhole Hamming join. Output: id_a, id_b, hamming.
    *
    * Blocking-width trade: the join keys on 60/(maxHamming+1)-bit
    * chunks, so the candidate set grows as buckets coarsen — at
    * maxHamming=8 each chunk has <= 2^7 values (measured ~4x slower
    * from bucket fan-out at 5k docs); keep chunks >= ~12 bits
    * (maxHamming <= 4) unless the corpus is small.
    */
  def phashPairs(
      df: DataFrame,
      binCol: String,
      idCol: String,
      maxHamming: Int = 4,
      bucketCap: Int = 0
  ): DataFrame =
    graft.dedup.PortableDedup
      .hammingPairs60(averageHash60(df, binCol, idCol), maxHamming, bucketCap)

  /** Nearest-neighbor RGB resize to exactly (w x h) — the same explicit
    * pixel arithmetic as [[lumaGrid]] (no Graphics2D filtering), so the
    * result is deterministic for a given JDK.
    */
  private[multimodal] def resizeRgb(
      img: java.awt.image.BufferedImage,
      w: Int,
      h: Int
  ): java.awt.image.BufferedImage = {
    val out =
      new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.getWidth / w).toInt
        out.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Batched image resize over the binary payload: decodable images are
    * nearest-neighbor-resized to (width x height) and re-encoded as
    * PNG into a new `resized` binary column (`was_resized` = true);
    * payloads no JDK reader decodes pass through with a NULL `resized`
    * and the flag false — same mapPartitions batch plumbing as
    * [[extractFeatures]], so a real codec swap touches only the kernel.
    */
  def resizeImages(
      df: DataFrame,
      binCol: String,
      width: Int,
      height: Int,
      batchSize: Int = 64
  ): DataFrame = {
    require(width > 0 && height > 0, s"target dims must be positive, got ${width}x$height")
    val inputSchema = df.schema
    val binIdx = inputSchema.fieldIndex(binCol)
    val outSchema = StructType(
      inputSchema.fields ++ Seq(
        StructField("resized", BinaryType),
        StructField("was_resized", BooleanType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          readImage(row.getAs[Array[Byte]](binIdx)) match {
            case Some(img) =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(resizeRgb(img, width, height), "png", bos)
              Row.fromSeq(row.toSeq ++ Seq(bos.toByteArray, true))
            case None =>
              Row.fromSeq(row.toSeq ++ Seq(null, false))
          }
        }
      }
    }(encoder)
  }

  /** TRUE perceptual hash `(id, sig)` over decodable images: decode via
    * ImageIO, nearest-neighbor-downscale to a 10x6 luma grid, and set
    * bit i iff cell i's luma exceeds the grid mean — the aHash
    * construction over real pixels, 60 bits wide so the signatures feed
    * the same pigeonhole Hamming join as the byte-level
    * [[averageHash60]]. Payloads no JDK reader decodes are DROPPED
    * (they have no pixels to hash — route them through
    * [[averageHash60]] instead).
    *
    * Scale shape: one scan, decode kernel per partition via
    * mapPartitions, output is 8-byte signatures — everything
    * downstream (banding, joins) is byte-identical to the text simhash
    * path.
    */
  def decodedAHash60(
      df: DataFrame,
      binCol: String,
      idCol: String,
      batchSize: Int = 64
  ): DataFrame = {
    val projected = df.select(col(idCol).as("id"), col(binCol).as("_payload"))
    val outSchema = StructType(
      Seq(projected.schema.fields(0).copy(name = "id"), StructField("sig", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    projected
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { row =>
            readImage(row.getAs[Array[Byte]]("_payload")).map { img =>
              val grid = lumaGrid(img, 10, 6)
              val mean = grid.sum.toDouble / grid.length
              var sig = 0L
              var i = 0
              while (i < 60) {
                if (grid(i) > mean) sig |= (1L << i)
                i += 1
              }
              Row(row.get(0), sig)
            }
          }
        }
      }(encoder)
  }

  /** Near-duplicate IMAGE pairs over real decoded pixels: [[decodedAHash60]]
    * signatures + the pigeonhole Hamming join. Output: id_a, id_b, hamming.
    */
  def decodedPhashPairs(
      df: DataFrame,
      binCol: String,
      idCol: String,
      maxHamming: Int = 4,
      batchSize: Int = 64,
      bucketCap: Int = 0
  ): DataFrame =
    graft.dedup.PortableDedup
      .hammingPairs60(decodedAHash60(df, binCol, idCol, batchSize), maxHamming, bucketCap)

  /** Little-endian unsigned integer read from `len` bytes of a binary
    * column at 1-based `pos` — pure `conv(hex(substring))` builtins,
    * codegen'd, one term per byte. NULL if the payload is shorter than
    * pos+len-1 (substring silently truncates; the hex-length guard
    * turns that into NULL instead of a wrong small value).
    */
  private[multimodal] def leUint(bin: Column, pos: Int, len: Int): Column = {
    val full = length(bin) >= lit(pos + len - 1)
    val terms = (0 until len).map { i =>
      conv(hex(substring(bin, pos + i, 1)), 16, 10).cast("long") * lit(1L << (8 * i))
    }
    when(full, terms.reduce(_ + _))
  }

  /** Big-endian unsigned integer read — [[leUint]]'s network-order
    * twin (hex of a multi-byte substring is already big-endian).
    */
  private[multimodal] def beUint(bin: Column, pos: Int, len: Int): Column =
    when(
      length(bin) >= lit(pos + len - 1),
      conv(hex(substring(bin, pos, len)), 16, 10).cast("long")
    )

  /** Container sniff + header dimensions for the scan-parseable image
    * formats — `image` struct `(container, width, height)`:
    * PNG (IHDR, big-endian), GIF (logical screen, little-endian),
    * BMP (BITMAPINFOHEADER, little-endian) via fixed-offset column
    * expressions, and JPEG via the codegen'd
    * [[graft.functions.mediaExpressions.JpegDims]] segment walk (its
    * SOF marker floats behind variable-length segments — a ~10-step
    * byte loop per row, still thousands of times cheaper than a
    * decode). Unknown or truncated payloads: NULL container / NULL
    * dims — flagged, never guessed (same contract as [[wavMeta]];
    * a truncated or frameless JPEG keeps container "jpeg", NULL dims).
    *
    * Scale shape: everything rides the scan inside whole-stage
    * codegen, zero shuffle, no payload copy — route the dims-bearing
    * subset straight to resolution filters without ever invoking a
    * decoder.
    */
  def imageMeta(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    val isPng = hex(substring(b, 1, 8)) === "89504E470D0A1A0A"
    val isGif = hex(substring(b, 1, 4)) === "47494638" // "GIF8"
    val isBmp = hex(substring(b, 1, 2)) === "424D" // "BM"
    val isJpeg = hex(substring(b, 1, 3)) === "FFD8FF"
    val jd = graft.functions.mediaExpressions.jpegDims(b)
    val container = when(b.isNull, lit(null).cast("string"))
      .when(isPng, "png")
      .when(isGif, "gif")
      .when(isBmp, "bmp")
      .when(isJpeg, "jpeg")
    val width = when(isPng, beUint(b, 17, 4))
      .when(isGif, leUint(b, 7, 2))
      .when(isBmp, leUint(b, 19, 4))
      .when(isJpeg, element_at(jd, 1))
    val height = when(isPng, beUint(b, 21, 4))
      .when(isGif, leUint(b, 9, 2))
      .when(isBmp, leUint(b, 23, 4))
      .when(isJpeg, element_at(jd, 2))
    df.withColumn(
      "image",
      struct(
        container.as("container"),
        width.as("width"),
        height.as("height")
      )
    )
  }

  /** Audio-header metadata from canonical 44-byte PCM WAV payloads —
    * the audio twin of the image `withMeta`/`extractFeatures` path,
    * but SQL-expressible end to end: `wav` struct with `(canonical,
    * channels, sample_rate, bits_per_sample, data_bytes,
    * duration_sec)`.
    *
    * `canonical` = RIFF/WAVE magic + 16-byte PCM fmt chunk + a "data"
    * chunk at offset 36 (the layout every stock encoder writes);
    * non-canonical or truncated payloads get `canonical = false` and
    * NULL fields — flagged, never guessed, same contract as the image
    * decoder's `decoded` flag. Real-world WAVs with extra chunks
    * (LIST/INFO) belong in a mapPartitions kernel like the image
    * decode; this is the scan-side fast path.
    *
    * Scale shape: pure column expressions over fixed offsets (hex +
    * conv builtins, whole-stage codegen) — header metadata for a
    * billion audio files rides the scan with zero shuffle and without
    * ever copying payload bytes.
    */
  def wavMeta(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    val canonical = b.isNotNull &&
      length(b) >= 44 &&
      hex(substring(b, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(b, 9, 8)) === "57415645666D7420" && // "WAVEfmt "
      leUint(b, 17, 4) === 16 && // PCM fmt chunk size
      leUint(b, 21, 2) === 1 && // audio_format = PCM
      hex(substring(b, 37, 4)) === "64617461" // "data"
    val channels = leUint(b, 23, 2)
    val rate = leUint(b, 25, 4)
    val bits = leUint(b, 35, 2)
    val dataBytes = leUint(b, 41, 4)
    def gated(c: Column): Column = when(canonical, c)
    df.withColumn(
      "wav",
      struct(
        coalesce(canonical, lit(false)).as("canonical"),
        gated(channels).as("channels"),
        gated(rate).as("sample_rate"),
        gated(bits).as("bits_per_sample"),
        gated(dataBytes).as("data_bytes"),
        gated(
          graft.functions.round6(
            dataBytes / (rate * channels * (bits / lit(8)))
          )
        ).as("duration_sec")
      )
    )
  }

  /** Content-level PCM16 sample statistics — the audio-quality filter
    * one layer below [[wavMeta]]'s header fields: `wav_stats` struct
    * `(n_samples, peak, rms, clip_frac, silence_frac)` via the
    * codegen'd [[graft.functions.mediaExpressions.WavPcm16Stats]]
    * kernel (amplitudes normalized to full scale; clipping = samples
    * at the int16 rails; silence = |s| ≤ ~1% FS). Non-canonical,
    * non-PCM16, or empty-data payloads keep NULL stats — flagged,
    * never guessed, same contract as [[wavMeta]].
    *
    * Scale shape: one tight per-row loop inside whole-stage codegen,
    * zero shuffle, no payload copy — gate a billion audio files on
    * clipping/silence before ever invoking a real decoder.
    */
  def wavPcmStats(df: DataFrame, binCol: String): DataFrame = {
    val st = graft.functions.mediaExpressions.wavPcm16Stats(col(binCol))
    df.withColumn("_st", st)
      .withColumn(
        "wav_stats",
        struct(
          element_at(col("_st"), 1).cast("long").as("n_samples"),
          element_at(col("_st"), 2).as("peak"),
          element_at(col("_st"), 3).as("rms"),
          element_at(col("_st"), 4).as("clip_frac"),
          element_at(col("_st"), 5).as("silence_frac")
        )
      )
      .drop("_st")
  }
}
