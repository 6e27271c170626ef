package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing queries (SURVEY §2.7): the `documents` text is
  * re-encoded into an opaque binary payload to exercise the real
  * binary-column data flow (schema, size/hash metadata, batched kernel
  * shape). Feature extraction itself is covered by ScalaTest specs —
  * its mapPartitions kernel is not SQL-expressible.
  */
object MultimodalQueries extends QueryPack {

  private val binaryMetaQ = Q(
    fn = (s, d) =>
      Multimodal
        .withMeta(
          Tables
            .documents(s, d)
            .withColumn("payload", encode(col("text"), "UTF-8")),
          "payload",
          "text/plain"
        )
        .select(
          col("doc_id"),
          col("meta.media_type").as("media_type"),
          col("meta.n_bytes").as("n_bytes")
        )
        .orderBy("doc_id"),
    oracle = Some("""
      SELECT doc_id, 'text/plain' AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents ORDER BY doc_id""")
  )

  /** Frame sampling: number of sampled frames and total sampled bytes
    * per document — exercises the chunk/stride arithmetic end-to-end.
    * Byte-slicing semantics are engine-checkable in SQL.
    */
  private val frameSampleQ = Q(
    fn = (s, d) =>
      Multimodal
        .sampleFrames(
          Tables
            .documents(s, d)
            .withColumn("payload", encode(col("text"), "UTF-8")),
          "payload",
          frameBytes = 256,
          stride = 4
        )
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("sampled_bytes")
        )
        .orderBy("doc_id"),
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
          unnest(range(0, CAST(floor(octet_length(encode(text)) / 256.0) AS BIGINT), 4)) AS frame_idx
        FROM documents)
      SELECT doc_id, count(*) AS n_frames,
        CAST(SUM(least(256, nb - frame_idx * 256)) AS BIGINT) AS sampled_bytes
      FROM f GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Perceptual-hash near-dup oracle: mirrors
    * Multimodal.averageHash60 + PortableDedup.hammingPairs60 step by
    * step — byte sampling via hex(payload) (identical uppercase hex on
    * both engines), mean threshold bits, pigeonhole chunk join.
    */
  private def phashSql(maxHamming: Int): String = {
    val hexdig = "'0123456789ABCDEF'"
    def byteSql(i: Int): String = {
      val pos = s"CAST(floor(($i * n) / 60.0) AS INT) * 2"
      s"(instr($hexdig, substr(hx, $pos + 1, 1)) - 1) * 16 + " +
        s"(instr($hexdig, substr(hx, $pos + 2, 1)) - 1) AS b$i"
    }
    val bytes = (0 until 60).map(byteSql).mkString(", ")
    val mean = (0 until 60).map(i => s"b$i").mkString("(", " + ", ") / 60.0")
    val sig = (0 until 60)
      .map(i => s"CASE WHEN b$i > mean THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    val chunks = maxHamming + 1
    val bounds = (0 to chunks).map(c => c * 60 / chunks)
    val chunkSelects = (0 until chunks)
      .map { c =>
        val lo = bounds(c)
        val mask = (1L << (bounds(c + 1) - lo)) - 1
        s"SELECT doc_id, sig, $c AS chunk, (sig >> $lo) & $mask AS ck FROM sigs"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx
        FROM documents WHERE octet_length(encode(text)) > 0),
      by AS (SELECT doc_id, $bytes FROM p),
      m AS (SELECT *, $mean AS mean FROM by),
      sigs AS (SELECT doc_id, CAST($sig AS BIGINT) AS sig FROM m),
      ch AS ($chunkSelects),
      sp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming)
      SELECT id_a, id_b, hamming FROM sp ORDER BY id_a, id_b"""
  }

  private val phashQ = Q(
    fn = (s, d) =>
      Multimodal
        .phashPairs(
          Tables
            .documents(s, d)
            .withColumn("payload", encode(col("text"), "UTF-8")),
          "payload",
          "doc_id",
          maxHamming = 6
        )
        .orderBy("id_a", "id_b"),
    oracle = Some(phashSql(6))
  )

  /** Audio plumbing roundtrip: a canonical PCM WAV payload is BUILT
    * in-plan from event fields (header arithmetic in column
    * expressions, `props` bytes as the data chunk), then parsed back
    * by the scan-side `wavMeta` — so the oracle states the expected
    * metadata DIRECTLY from the fields, and a parse that didn't
    * exactly invert the build hash-fails. Spark-only helper: the
    * little-endian hex builder never appears in the oracle.
    */
  private def leHex(x: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
    concat((0 until nBytes).map { i =>
      lpad(hex(shiftright(x, 8 * i).bitwiseAND(lit(255L))), 2, "0")
    }: _*)

  private def beHex(x: org.apache.spark.sql.Column, nBytes: Int): org.apache.spark.sql.Column =
    lpad(hex(x), nBytes * 2, "0")

  private val wavQ = {
    Q(
      fn = (s, d) => {
        val e = Tables
          .events(s, d)
          .select(
            col("event_id"),
            (lit(1L) + pmod(col("event_id"), lit(2))).as("ch"),
            (lit(8000L) * (lit(1L) + pmod(col("user_id"), lit(3)))).as("rate"),
            encode(col("props"), "UTF-8").as("data")
          )
          .withColumn("dlen", length(col("data")).cast("long"))
        val header = concat(
          lit("52494646"), // RIFF
          leHex(col("dlen") + 36L, 4),
          lit("57415645666D7420"), // WAVEfmt_
          leHex(lit(16L), 4), // PCM fmt size
          leHex(lit(1L), 2), // format = PCM
          leHex(col("ch"), 2),
          leHex(col("rate"), 4),
          leHex(col("rate") * col("ch") * 2L, 4), // byte rate
          leHex(col("ch") * 2L, 2), // block align
          leHex(lit(16L), 2), // bits
          lit("64617461"), // data
          leHex(col("dlen"), 4)
        )
        Multimodal
          .wavMeta(
            e.withColumn("payload", concat(unhex(header), col("data"))),
            "payload"
          )
          .select(
            col("event_id"),
            col("wav.canonical").as("canonical"),
            col("wav.channels").as("channels"),
            col("wav.sample_rate").as("sample_rate"),
            col("wav.bits_per_sample").as("bits_per_sample"),
            col("wav.data_bytes").as("data_bytes"),
            col("wav.duration_sec").as("duration_sec")
          )
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, true AS canonical,
          1 + event_id % 2 AS channels,
          8000 * (1 + user_id % 3) AS sample_rate,
          CAST(16 AS BIGINT) AS bits_per_sample,
          CAST(octet_length(encode(props)) AS BIGINT) AS data_bytes,
          round(octet_length(encode(props)) /
            ((8000 * (1 + user_id % 3)) * (1 + event_id % 2) * 2.0), 6)
            AS duration_sec
        FROM events ORDER BY event_id""")
    )
  }

  /** Content-level PCM16 sample statistics via the codegen'd
    * `WavPcm16Stats` kernel: a known int16 waveform is BUILT in-plan —
    * sample pattern `v_i = (event_id·7919 + i·104729) mod 2^16`,
    * two's-complement signed — wrapped in a canonical mono-8kHz
    * header, then parsed back. The oracle recomputes every sample
    * from the generating formula and re-derives peak/RMS/clip/silence
    * per event, so the kernel's byte-level sample decode is
    * hash-verified sample by sample. A `event_id % 7 = 0` residue
    * class ships raw text bytes: NULL stats — flagged, never guessed.
    */
  private val wavStatsQ = Q(
    fn = (s, d) => {
      val e = Tables
        .events(s, d)
        .select(
          col("event_id"),
          (lit(4L) + pmod(col("event_id"), lit(13L))).as("n"),
          encode(col("props"), "UTF-8").as("raw")
        )
      val dataHex = array_join(
        transform(
          sequence(lit(0L), col("n") - 1),
          i =>
            leHex(
              pmod(col("event_id") * 7919L + i * 104729L, lit(65536L)),
              2
            )
        ),
        ""
      )
      val header = concat(
        lit("52494646"), // RIFF
        leHex(col("n") * 2L + 36L, 4),
        lit("57415645666D7420"), // WAVEfmt_
        leHex(lit(16L), 4), // PCM fmt size
        leHex(lit(1L), 2), // format = PCM
        leHex(lit(1L), 2), // mono
        leHex(lit(8000L), 4), // rate
        leHex(lit(16000L), 4), // byte rate
        leHex(lit(2L), 2), // block align
        leHex(lit(16L), 2), // bits
        lit("64617461"), // data
        leHex(col("n") * 2L, 4)
      )
      val payload = when(pmod(col("event_id"), lit(7L)) === 0, col("raw"))
        .otherwise(unhex(concat(header, dataHex)))
      Multimodal
        .wavPcmStats(e.withColumn("payload", payload), "payload")
        .select(
          col("event_id"),
          col("wav_stats.n_samples").as("n_samples"),
          graft.functions.round6(col("wav_stats.peak")).as("peak"),
          graft.functions.round6(col("wav_stats.rms")).as("rms"),
          graft.functions
            .round6(col("wav_stats.clip_frac"))
            .as("clip_frac"),
          graft.functions
            .round6(col("wav_stats.silence_frac"))
            .as("silence_frac")
        )
        .orderBy("event_id")
    },
    oracle = Some("""
      WITH e AS (SELECT event_id, 4 + event_id % 13 AS n FROM events),
      sv AS (SELECT event_id,
          CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
        FROM (SELECT event_id, (event_id * 7919 + i * 104729) % 65536 AS v
          FROM e, LATERAL unnest(range(0, n)) AS g(i))),
      a AS (SELECT event_id,
          CAST(count(*) AS BIGINT) AS n_samples,
          round(max(abs(s)) / 32768.0, 6) AS peak,
          round(sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) / 32768.0, 6)
            AS rms,
          round(count(*) FILTER (WHERE s IN (32767, -32768))
            / CAST(count(*) AS DOUBLE), 6) AS clip_frac,
          round(count(*) FILTER (WHERE abs(s) <= 327)
            / CAST(count(*) AS DOUBLE), 6) AS silence_frac
        FROM sv GROUP BY 1)
      SELECT e.event_id,
        CASE WHEN e.event_id % 7 <> 0 THEN a.n_samples END AS n_samples,
        CASE WHEN e.event_id % 7 <> 0 THEN a.peak END AS peak,
        CASE WHEN e.event_id % 7 <> 0 THEN a.rms END AS rms,
        CASE WHEN e.event_id % 7 <> 0 THEN a.clip_frac END AS clip_frac,
        CASE WHEN e.event_id % 7 <> 0 THEN a.silence_frac END
          AS silence_frac
      FROM e JOIN a USING (event_id) ORDER BY event_id""")
  )

  /** PNG/GIF/BMP headers BUILT in-plan (dims derived from doc
    * fields), parsed back by the scan-side `imageMeta` — the oracle
    * states the expected dims directly, so a non-inverting parse
    * hash-fails (same roundtrip contract as the WAV query). A fourth
    * residue class ships raw text bytes: unknown container, NULL dims.
    */
  private val imageDimsQ = Q(
    fn = (s, d) => {
      val e = Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          (lit(16L) + pmod(col("doc_id"), lit(100))).as("w"),
          (lit(16L) + pmod(col("n_chars"), lit(50))).as("h"),
          pmod(col("doc_id"), lit(4)).as("m"),
          encode(col("text"), "UTF-8").as("raw")
        )
      val png = concat(
        lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
        beHex(col("w"), 4), beHex(col("h"), 4)
      )
      val gif = concat(
        lit("474946383961"), leHex(col("w"), 2), leHex(col("h"), 2)
      )
      val bmp = concat(
        lit("424D"), leHex(lit(0L), 4), lit("00000000"), leHex(lit(54L), 4),
        leHex(lit(40L), 4), leHex(col("w"), 4), leHex(col("h"), 4)
      )
      val payload = when(col("m") === 0, unhex(png))
        .when(col("m") === 1, unhex(gif))
        .when(col("m") === 2, unhex(bmp))
        .otherwise(col("raw"))
      Multimodal
        .imageMeta(e.withColumn("payload", payload), "payload")
        .select(
          col("doc_id"),
          col("image.container").as("container"),
          col("image.width").as("width"),
          col("image.height").as("height")
        )
        .orderBy("doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
        CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
          WHEN 2 THEN 'bmp' END AS container,
        CASE WHEN doc_id % 4 <= 2 THEN 16 + doc_id % 100 END AS width,
        CASE WHEN doc_id % 4 <= 2 THEN 16 + n_chars % 50 END AS height
      FROM documents ORDER BY doc_id""")
  )

  /** JPEG dims via the codegen'd segment walk
    * (`mediaExpressions.JpegDims`): canonical JPEG streams BUILT
    * in-plan (SOI → JFIF APP0 → a COM segment → SOF0 carrying
    * doc-derived dims — the walk must skip two variable-length
    * segments to find them), plus a truncated stream and an
    * SOS-before-SOF stream (container "jpeg", NULL dims — flagged,
    * never guessed) and a raw-text residue (NULL container). The
    * oracle states the expected dims directly, so a non-inverting
    * parse hash-fails — same roundtrip contract as the PNG/GIF/BMP
    * and WAV queries.
    */
  private val jpegDimsQ = Q(
    fn = (s, d) => {
      val e = Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          (lit(16L) + pmod(col("doc_id"), lit(1000))).as("w"),
          (lit(16L) + pmod(col("n_chars"), lit(200))).as("h"),
          pmod(col("doc_id"), lit(4)).as("m"),
          encode(col("text"), "UTF-8").as("raw")
        )
      val app0 = "FFE000104A464946000101000001000100 00".replace(" ", "")
      val com = "FFFE000674657374"
      val sof0 = concat(
        lit("FFC0001108"), beHex(col("h"), 2), beHex(col("w"), 2),
        lit("03011100021101031101")
      )
      val full = concat(lit("FFD8"), lit(app0), lit(com), sof0)
      val payload = when(col("m") === 0, unhex(full))
        .when(col("m") === 1, unhex(lit("FFD8FFE0"))) // truncated
        .when(col("m") === 2, unhex(lit("FFD8FFDA00084142"))) // SOS first
        .otherwise(col("raw"))
      Multimodal
        .imageMeta(e.withColumn("payload", payload), "payload")
        .select(
          col("doc_id"),
          col("image.container").as("container"),
          col("image.width").as("width"),
          col("image.height").as("height")
        )
        .orderBy("doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 4 <= 2 THEN 'jpeg' END AS container,
        CASE WHEN doc_id % 4 = 0 THEN 16 + doc_id % 1000 END AS width,
        CASE WHEN doc_id % 4 = 0 THEN 16 + n_chars % 200 END AS height
      FROM documents ORDER BY doc_id""")
  )

  /** MP4 movie-header walk (`mediaExpressions.Mp4Meta`): canonical
    * ISO-BMFF streams BUILT in-plan — ftyp then a moov/mvhd carrying
    * doc-derived timescale/duration, in BOTH mvhd versions (v0 32-bit
    * and v1 64-bit times) — plus a moov-without-mvhd stream (NULL —
    * flagged, never guessed), a 64-bit-largesize mdat BEFORE moov (the
    * >4 GiB long-video layout — parsed, not refused), and a raw-text
    * residue (NULL). The oracle
    * states timescale/duration/duration_ms directly from the source
    * fields, so a non-inverting walk hash-fails — the same roundtrip
    * contract as the JPEG/WAV kernels.
    */
  private val mp4Q = Q(
    fn = (s, d) => {
      val ts = lit(600L) + pmod(col("doc_id"), lit(1000))
      val dur = lit(1000L) + pmod(col("n_chars"), lit(5000))
      val ftyp = lit("000000106674797069736F6D00000000")
      val mvhd0 = concat(
        lit("0000001C6D766864"), // size 28, 'mvhd'
        lit("00000000"), // version 0 + flags
        lit("0000000000000000"), // creation + modification
        beHex(ts, 4),
        beHex(dur, 4)
      )
      val moov0 = concat(lit("000000246D6F6F76"), mvhd0) // size 36
      val mvhd1 = concat(
        lit("000000286D766864"), // size 40, 'mvhd'
        lit("01000000"), // version 1 + flags
        lit("00000000000000000000000000000000"), // creation + mod (64-bit)
        beHex(ts, 4),
        beHex(dur, 8)
      )
      val moov1 = concat(lit("000000306D6F6F76"), mvhd1) // size 48
      // moov whose only child is a free box: well-formed, no mvhd
      val moovEmpty = lit("000000106D6F6F760000000866726565")
      // 64-bit `largesize` mdat (size field 1, actual 24 bytes in the
      // 8 bytes after the 4cc) BEFORE moov — the >4 GiB mdat-first
      // layout, scaled down: the walk must parse the largesize to
      // reach the header
      val mdatLarge =
        lit("000000016D6461740000000000000018DEADBEEFDEADBEEF")
      val m = pmod(col("doc_id"), lit(5))
      val payload = when(m === 0, unhex(concat(ftyp, moov0)))
        .when(m === 1, unhex(concat(ftyp, moov1)))
        .when(m === 2, unhex(concat(ftyp, moovEmpty)))
        .when(m === 3, unhex(concat(ftyp, mdatLarge, moov0)))
        .otherwise(encode(col("text"), "UTF-8"))
      val meta = graft.functions.mediaExpressions.mp4Meta(payload)
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          element_at(meta, 1).as("timescale"),
          element_at(meta, 2).as("duration"),
          element_at(meta, 3).as("duration_ms")
        )
        .orderBy("doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 5 IN (0, 1, 3) THEN 600 + doc_id % 1000 END AS timescale,
        CASE WHEN doc_id % 5 IN (0, 1, 3) THEN 1000 + n_chars % 5000 END AS duration,
        CASE WHEN doc_id % 5 IN (0, 1, 3) THEN
          ((1000 + n_chars % 5000) * 1000) // (600 + doc_id % 1000)
        END AS duration_ms
      FROM documents ORDER BY doc_id""")
  )

  val queries: Map[String, Q] = Map(
    "multimodal_mp4_meta" -> mp4Q,
    "multimodal_image_dims" -> imageDimsQ,
    "multimodal_jpeg_dims" -> jpegDimsQ,
    "multimodal_binary_meta" -> binaryMetaQ,
    "multimodal_frame_sample" -> frameSampleQ,
    "multimodal_wav_meta" -> wavQ,
    "multimodal_wav_pcm_stats" -> wavStatsQ,
    "multimodal_phash_pairs" -> phashQ
  )
}
