package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernels — the missing piece between raw
  * crawl text and every hash-keyed operator in the library: the same
  * user-visible string arrives as precomposed (é) or decomposed
  * (e + U+0301) byte sequences, and compatibility variants (ﬁ, ５, ㎞)
  * split what should be one dedup/fingerprint/shingle key into many.
  * Spark ships NO normalizer builtin, so without a kernel this becomes
  * a per-row Scala UDF — opaque to codegen — or an upstream
  * preprocessing job. Here it is one codegen'd scan-side expression:
  * normalize once on the first read, every downstream md5/xxh64/
  * minhash/BPE sees canonical bytes.
  *
  * Forms: the four standard ones (java.text.Normalizer implements
  * Unicode Standard Annex #15 — NFC agrees with DuckDB/utf8proc's
  * `nfc_normalize`, which the oracle leans on). `stripAccents`
  * composes NFD → drop combining marks (\\p{Mn}) → NFC, matching
  * DuckDB's `strip_accents` on its supported range — the
  * search/join-key folding step (résumé == resume), NOT a lossless
  * transform; pair it with NFKC when compatibility variants matter
  * (the kernel leaves ﬁ/５ alone, same as DuckDB).
  */
object UnicodeKernels {

  /** ASCII fast path: all four forms and the accent strip are identity
    * on pure-ASCII bytes, and corpus text is overwhelmingly ASCII —
    * skipping the String round-trip there keeps the scan at
    * memcmp-like cost.
    */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def normalize(s: UTF8String, form: String): UTF8String = {
    if (isAscii(s)) return s
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  private val marks = "\\p{Mn}+".r

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val stripped = marks.replaceAllIn(nfd, "")
    UTF8String.fromString(
      Normalizer.normalize(stripped, Normalizer.Form.NFC)
    )
  }
}

/** Catalyst expressions over [[UnicodeKernels]]. */
object unicodeExpressions {

  private val kernel = "graft.functions.UnicodeKernels"

  private val validForms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** `unicode_normalize(text)` under a plan-time-constant form. */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {

    require(
      validForms(form),
      s"form must be one of ${validForms.mkString("/")}, got $form"
    )

    override def prettyName: String = "unicode_normalize"
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      UnicodeKernels.normalize(input.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"""${ev.value} = $kernel.normalize($c, "$form");"""
      )

    override protected def withNewChildInternal(
        newChild: Expression
    ): UnicodeNormalize = copy(child = newChild)
  }

  /** `strip_accents(text)` — NFD, drop combining marks, NFC. */
  case class StripAccents(child: Expression) extends UnaryExpression {

    override def prettyName: String = "strip_accents"
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      UnicodeKernels.stripAccents(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.stripAccents($c);")

    override protected def withNewChildInternal(
        newChild: Expression
    ): StripAccents = copy(child = newChild)
  }

  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(GraftColumnBridge.expression(c), form)
    )

  def stripAccents(c: Column): Column =
    GraftColumnBridge.column(StripAccents(GraftColumnBridge.expression(c)))
}
