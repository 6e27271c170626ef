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

  def jpegDims(c: Column): Column =
    GraftColumnBridge.column(JpegDims(GraftColumnBridge.expression(c)))

  def charEntropy(c: Column): Column =
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(c)))
}
