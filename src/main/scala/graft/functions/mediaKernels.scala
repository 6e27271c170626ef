package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row JVM kernels for media-header and text-statistics
  * expressions — same design as [[HashKernels]]: one tight loop per
  * row, called identically from the interpreted path and from
  * generated Java (`doGenCode`), so whole-stage codegen stays fused
  * and parity holds by construction.
  */
object MediaKernels {

  /** JPEG frame dimensions from the segment stream: walks markers from
    * SOI until a start-of-frame (SOF0-SOF15 minus DHT/JPG/DAC) and
    * reads the big-endian height/width that every SOF variant carries
    * at the same offsets (ITU T.81 §B.2.2). Returns `[width, height]`,
    * or null when the payload is not a JPEG, is truncated mid-segment,
    * or reaches SOS/EOI without a frame header — flagged, never
    * guessed, the same contract as the fixed-offset sniffers.
    *
    * The variable-length segment walk is exactly why `imageMeta`'s
    * pure-SQL fixed-offset expressions could not cover JPEG; a ~10-
    * iteration byte loop per row is still thousands of times cheaper
    * than a decode and keeps the billion-image resolution filter
    * scan-side.
    */
  def jpegDims(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (n < 4 || u8(0) != 0xff || u8(1) != 0xd8) return null
    var i = 2
    while (i + 3 < n) {
      if (u8(i) != 0xff) return null // lost sync — malformed stream
      // fill bytes: any number of 0xFF may pad before a marker
      var j = i
      while (j + 1 < n && u8(j + 1) == 0xff) j += 1
      if (j + 1 >= n) return null
      val marker = u8(j + 1)
      marker match {
        // standalone markers (no length field)
        case 0x01 => i = j + 2
        case m if m >= 0xd0 && m <= 0xd7 => i = j + 2 // RSTn
        case 0xd9 => return null // EOI before any SOF
        case 0xda => return null // SOS: entropy data, SOF never follows
        case m
            if m >= 0xc0 && m <= 0xcf &&
              m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn: [len(2)] [precision(1)] [height(2)] [width(2)]
          if (j + 8 >= n) return null
          val h = u16(j + 5).toLong
          val w = u16(j + 7).toLong
          return new GenericArrayData(Array(w, h))
        case _ =>
          if (j + 3 >= n) return null
          val segLen = u16(j + 2)
          if (segLen < 2) return null
          i = j + 2 + segLen
      }
    }
    null
  }

  /** ISO-BMFF (MP4/MOV/M4A) movie-header walk —
    * `[timescale, duration_ticks, duration_ms]` from `moov/mvhd`, or
    * null for non-BMFF / truncated / headerless payloads. The video
    * analogue of [[jpegDims]]: a duration/sanity gate over a billion
    * clips must read a few dozen header bytes per file, never hand the
    * payload to a demuxer. Walks top-level boxes (skipping `ftyp`,
    * `free`, mdat payloads by their declared size), descends one level
    * into `moov` for `mvhd`, and handles both version 0 (32-bit
    * times) and version 1 (64-bit). Contract as the other header
    * kernels: malformed sizes (< 8; or a size-0 to-EOF box, which only
    * a trailing box may carry and this walk never needs), truncation
    * mid-field, or a missing mvhd → null — flagged, never guessed.
    * 64-bit `largesize` boxes (size field == 1, actual size in the 8
    * bytes after the 4cc, ISO 14496-12 §4.2) are PARSED, not refused:
    * files over 4 GiB — exactly the long-video curation target —
    * routinely carry a largesize `mdat` BEFORE `moov`, and the walk
    * must skip it to reach the header. A largesize field that is
    * itself truncated, negative, or smaller than its own 16-byte
    * header → null. duration_ms is floor(ticks * 1000 / timescale),
    * -1 when timescale is 0 (seen in the wild; the raw fields stay
    * readable).
    */
  def mp4Meta(bytes: Array[Byte]): ArrayData = {
    if (bytes == null) return null
    val n = bytes.length
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int, s: String): Boolean =
      (0 until 4).forall(k => u8(i + 4 + k) == s.charAt(k).toInt)
    if (n < 16) return null
    // a BMFF stream must LEAD with a well-formed box whose type is a
    // known top-level 4cc — raw text rarely survives that check
    if (!fourcc(0, "ftyp") && !fourcc(0, "moov") && !fourcc(0, "mdat") &&
      !fourcc(0, "free") && !fourcc(0, "wide") && !fourcc(0, "skip"))
      return null
    var off = 0L
    while (off + 8 <= n) {
      val o = off.toInt
      val s32 = be32(o)
      var size = s32
      var hdr = 8L
      if (s32 == 1) { // largesize: 64-bit size after the 4cc
        if (off + 16 > n) return null // truncated largesize field
        size = be64(o + 8)
        hdr = 16L
        if (size < 16) return null // must cover its own 16-byte header
      } else if (s32 < 8) return null // size-0 to-EOF or malformed
      if (fourcc(o, "moov")) {
        // a declared size past the buffer clamps (truncated capture):
        // every field read below re-checks against `end`
        val end =
          if (size > n.toLong - off) n.toLong else off + size
        var in = off + hdr
        while (in + 8 <= end) {
          val io = in.toInt
          val c32 = be32(io)
          var s2 = c32
          var h2 = 8L
          if (c32 == 1) {
            if (in + 16 > end) return null
            s2 = be64(io + 8)
            h2 = 16L
            if (s2 < 16) return null
          } else if (c32 < 8) return null
          if (fourcc(io, "mvhd")) {
            val c = (in + h2).toInt // content: version(1) flags(3) ...
            if (in + h2 + 4 > end) return null
            val v = u8(c)
            val (ts, dur) =
              if (v == 0) {
                if (in + h2 + 4 + 16 > end) return null
                (be32(c + 12), be32(c + 16))
              } else if (v == 1) {
                if (in + h2 + 4 + 28 > end) return null
                (be32(c + 20), be64(c + 24))
              } else return null
            val ms = if (ts == 0L) -1L else dur * 1000L / ts
            return new GenericArrayData(Array(ts, dur, ms))
          }
          if (s2 > end - in) return null // child overruns moov
          in += s2
        }
        return null // moov without mvhd — malformed
      }
      if (size > n.toLong - off) return null // box truncated before moov
      off += size
    }
    null
  }

  /** Greedy BPE apply over one already-normalized text (subword-nmt
    * semantics, the inference twin of
    * [[graft.text.Text.bpeTrain]]'s learner): per whitespace word,
    * start from characters plus the `</w>` sentinel and repeatedly
    * merge ALL occurrences of the LOWEST-RANK adjacent pair until no
    * learned pair applies; emit the concatenated subword stream.
    * `ranks` maps "left right" (space-separated) → merge rank —
    * unambiguous because symbols are built from space-split words and
    * can never contain a space themselves.
    *
    * One JVM loop per row over a driver-bounded merge table — the
    * expression ships the rank map as a codegen reference object, so
    * tokenizing a billion documents stays a scan-side projection.
    */
  def bpeEncode(
      s: UTF8String,
      ranks: java.util.HashMap[String, Integer]
  ): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val words = s.toString.split(' ')
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        syms += "</w>"
        var done = false
        while (!done && syms.length > 1) {
          var bestRank = Int.MaxValue
          var bl: String = null
          var br: String = null
          var j = 0
          while (j < syms.length - 1) {
            val r = ranks.get(syms(j) + " " + syms(j + 1))
            if (r != null && r < bestRank) {
              bestRank = r; bl = syms(j); br = syms(j + 1)
            }
            j += 1
          }
          if (bl == null) done = true
          else {
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < syms.length) {
              if (k + 1 < syms.length && syms(k) == bl && syms(k + 1) == br) {
                next += (bl + br); k += 2
              } else { next += syms(k); k += 1 }
            }
            syms = next
          }
        }
        syms.foreach(t => out += UTF8String.fromString(t))
      }
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Shannon entropy (natural log) over a string's Unicode code
    * points: `H = ln(n) − (Σ c·ln c)/n` from exact integer counts —
    * the algebraic form keeps one float sum over DISTINCT code points
    * (iterated in sorted order, so the kernel is order-deterministic)
    * instead of a per-character p·ln p stream. Empty string → 0.0.
    */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var s1 = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      s1 += c * math.log(c)
    }
    math.log(n.toDouble) - s1 / n
  }

  /** Sample statistics over a canonical PCM16 WAV payload — the
    * content-level audio-curation signal one layer below
    * [[graft.multimodal.Multimodal.wavMeta]]'s header metadata:
    * `[n_samples, peak, rms, clip_frac, silence_frac]` with
    * amplitudes normalized to full scale (/32768), clipping = samples
    * pinned at the int16 rails (32767 / −32768), silence = |s| ≤ 327
    * (~1% FS, an integer threshold so the count is engine-exact).
    * Channels are interleaved int16 little-endian per the header this
    * kernel requires; stats run over the interleaved stream.
    *
    * Contract mirrors the other header kernels: non-canonical,
    * non-PCM16, or empty-data payloads → null (flagged, never
    * guessed); a data chunk shorter than its declared length is
    * clamped to the bytes present; a trailing odd byte is ignored.
    * One tight loop per row, no payload copy — RMS/clipping gates for
    * a billion audio files ride the scan.
    */
  def wavPcm16Stats(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 44) return null
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      (0 until s.length).forall(k => u8(i + k) == s.charAt(k).toInt)
    if (!tag(0, "RIFF") || !tag(8, "WAVEfmt ") || !tag(36, "data"))
      return null
    if (le32(16) != 16L || le16(20) != 1 || le16(34) != 16) return null
    val dataBytes = le32(40)
    val avail = math.min(dataBytes, (bytes.length - 44).toLong)
    val n = (avail / 2).toInt
    if (n == 0) return null
    var i = 0
    var sumSq = 0L
    var maxAbs = 0
    var clip = 0
    var silent = 0
    while (i < n) {
      val s = (bytes(45 + 2 * i).toInt << 8) | u8(44 + 2 * i)
      val a = if (s < 0) -s else s
      if (a > maxAbs) maxAbs = a
      sumSq += s.toLong * s
      if (s == 32767 || s == -32768) clip += 1
      if (a <= 327) silent += 1
      i += 1
    }
    new GenericArrayData(
      Array[Any](
        n.toDouble,
        maxAbs / 32768.0,
        math.sqrt(sumSq.toDouble / n) / 32768.0,
        clip.toDouble / n,
        silent.toDouble / n
      )
    )
  }
}

/** Catalyst expressions over [[MediaKernels]] — codegen'd, null-safe,
  * scan-side.
  */
object mediaExpressions {

  private val kernels = "graft.functions.MediaKernels"

  /** `jpeg_dims(binary)` → `[width, height]` or NULL (non-JPEG /
    * truncated / frameless payloads).
    */
  case class JpegDims(child: Expression) extends UnaryExpression {

    override def prettyName: String = "jpeg_dims"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      MediaKernels.jpegDims(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = nullSafeCodeGen(
        ctx,
        ev,
        c => s"""
          ${ev.value} = $kernels.jpegDims($c);
          ${ev.isNull} = ${ev.value} == null;"""
      )
      res
    }

    override protected def withNewChildInternal(newChild: Expression): JpegDims =
      copy(child = newChild)
  }

  /** `char_entropy(string)` → natural-log Shannon entropy over code
    * points (double).
    */
  case class CharEntropy(child: Expression) extends UnaryExpression {

    override def prettyName: String = "char_entropy"
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      MediaKernels.charEntropy(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.charEntropy($c);")

    override protected def withNewChildInternal(newChild: Expression): CharEntropy =
      copy(child = newChild)
  }

  /** `wav_pcm16_stats(binary)` → `[n_samples, peak, rms, clip_frac,
    * silence_frac]` (doubles, amplitudes normalized to full scale) or
    * NULL for non-canonical / non-PCM16 / empty-data payloads.
    */
  case class WavPcm16Stats(child: Expression) extends UnaryExpression {

    override def prettyName: String = "wav_pcm16_stats"
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      MediaKernels.wavPcm16Stats(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"""
          ${ev.value} = $kernels.wavPcm16Stats($c);
          ${ev.isNull} = ${ev.value} == null;"""
      )

    override protected def withNewChildInternal(newChild: Expression): WavPcm16Stats =
      copy(child = newChild)
  }

  /** `mp4_meta(binary)` → `[timescale, duration_ticks, duration_ms]`
    * or NULL (non-BMFF / truncated / headerless).
    */
  case class Mp4Meta(child: Expression) extends UnaryExpression {

    override def prettyName: String = "mp4_meta"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      MediaKernels.mp4Meta(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"""
          ${ev.value} = $kernels.mp4Meta($c);
          ${ev.isNull} = ${ev.value} == null;"""
      )

    override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
      copy(child = newChild)
  }

  /** `bpe_encode(string)` → array of subword tokens under a FIXED
    * learned merge table (rank = position in `merges`). The table is
    * driver-bounded (one row per learned merge) and ships to executors
    * as a codegen reference object — not a join, not a broadcast
    * DataFrame: tokenization is a pure scan-side projection.
    */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {

    override def prettyName: String = "bpe_encode"
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}"
        )
    }

    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        m.put(l + " " + r, Int.box(i))
      }
      m
    }

    override protected def nullSafeEval(input: Any): Any =
      MediaKernels.bpeEncode(input.asInstanceOf[UTF8String], ranks)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.bpeEncode($c, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  def jpegDims(c: Column): Column =
    GraftColumnBridge.column(JpegDims(GraftColumnBridge.expression(c)))

  def charEntropy(c: Column): Column =
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(c)))

  def wavPcm16Stats(c: Column): Column =
    GraftColumnBridge.column(WavPcm16Stats(GraftColumnBridge.expression(c)))

  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncode(GraftColumnBridge.expression(c), merges))

  def mp4Meta(c: Column): Column =
    GraftColumnBridge.column(Mp4Meta(GraftColumnBridge.expression(c)))
}
