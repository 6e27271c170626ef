package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.7).
  *
  * Media (image/audio/video) travels through the pipeline as an opaque
  * `binary` column plus a typed metadata struct — the engine never
  * interprets the bytes except inside an explicit decode kernel. The
  * Spark-side plumbing (schema, partition sizing, batched kernel
  * invocation via `mapPartitions`) is real; the decode kernels
  * themselves are DETERMINISTIC STUBS (this environment ships no image/
  * audio codecs) marked `// STUB:` — swap the function body for a real
  * decoder (JNI/FFI) without touching any plumbing.
  */
object Multimodal {

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

  /** Pretend "decoded frame" features. Output schema mirrors what a
    * real image decode would produce; values are a deterministic
    * function of the bytes so tests are stable.
    */
  val featureSchema: StructType = StructType(
    Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
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
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // STUB: a real kernel would decode `batch.map(_.getAs[Array[Byte]](binIdx))`
        // in one vectorized call here. The deterministic fake below
        // preserves the exact data flow and output shape.
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          val n = if (bytes == null) 0 else bytes.length
          val width = 16 + (math.abs(java.util.Arrays.hashCode(bytes)) % 64)
          val height = 16 + (n % 64)
          val feature = Array.tabulate(featureDim) { j =>
            if (n == 0) 0.0f
            else bytes(j % n).toFloat / 128.0f
          }
          Row.fromSeq(row.toSeq ++ Seq(width, height, feature))
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
    df.select(col(idCol).as("id"), n.as("_n"), hx.as("_hx"))
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
      maxHamming: Int = 4
  ): DataFrame =
    graft.dedup.PortableDedup.hammingPairs60(averageHash60(df, binCol, idCol), maxHamming)
}
