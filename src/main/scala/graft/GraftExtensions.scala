package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.hashExpressions._
import graft.functions.TopKByAgg

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same codegen'd kernels the Column API uses:
  *
  * {{{
  * spark.sql("SELECT simhash64(token_hashes(text)) FROM docs")
  * spark.sql("SELECT g, topk_by(score, id, 5) FROM t GROUP BY g")
  * }}}
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard mechanism a cluster admin enables once for every session
  * (works with Spark Connect and plain submit alike; no code changes
  * for SQL-only users).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a literal INT $arg, got: $other"
      )
  }

  private def strLit(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v, t) if t.typeName == "string" && v != null => v.toString
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a literal STRING $arg, got: $other"
      )
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fn(
      name: String,
      usage: String,
      arity: Int,
      builder: Seq[Expression] => Expression
  ): (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = {
    val checked: FunctionBuilder = args => {
      if (args.size != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${args.size} — usage: $usage"
        )
      builder(args)
    }
    (FunctionIdentifier(name), info(name, usage), checked)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      fn(
        "token_hashes",
        "token_hashes(text) - one XXH64 per whitespace token, hashed over UTF-8 bytes",
        1,
        args => TokenHashes(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "shingle_hashes",
        "shingle_hashes(token_hashes, n) - chained XXH64 of each n-token window",
        2,
        args => ShingleHashes(args.head, intLit(args(1), "shingle_hashes", "n"))
      )
    )
    ext.injectFunction(
      fn(
        "minhash_signature",
        "minhash_signature(shingle_hashes, k) - k-seed MinHash signature",
        2,
        args => MinHashSignature(args.head, intLit(args(1), "minhash_signature", "k"))
      )
    )
    ext.injectFunction(
      fn(
        "simhash64",
        "simhash64(token_hashes) - 64-bit SimHash from per-token hash votes",
        1,
        args => SimHash64(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "dot_product",
        "dot_product(a, b) - dot product of two float arrays",
        2,
        args => DotProduct(args.head, args(1))
      )
    )
    ext.injectFunction(
      fn(
        "jpeg_dims",
        "jpeg_dims(binary) - [width, height] from the JPEG SOF frame header, NULL when absent/malformed",
        1,
        args => graft.functions.mediaExpressions.JpegDims(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "char_entropy",
        "char_entropy(text) - Shannon entropy (nats) over the string's code points",
        1,
        args => graft.functions.mediaExpressions.CharEntropy(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "wav_pcm16_stats",
        "wav_pcm16_stats(binary) - [n_samples, peak, rms, clip_frac, silence_frac] over a canonical PCM16 WAV, NULL when non-canonical",
        1,
        args => graft.functions.mediaExpressions.WavPcm16Stats(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "mp4_meta",
        "mp4_meta(binary) - [timescale, duration_ticks, duration_ms] from the ISO-BMFF moov/mvhd header, NULL when absent/malformed",
        1,
        args => graft.functions.mediaExpressions.Mp4Meta(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "unicode_normalize",
        "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode normalization (UAX #15)",
        2,
        args =>
          graft.functions.unicodeExpressions.UnicodeNormalize(
            args.head,
            strLit(args(1), "unicode_normalize", "form")
          )
      )
    )
    ext.injectFunction(
      fn(
        "strip_accents",
        "strip_accents(text) - NFD, drop combining marks, NFC (accent folding)",
        1,
        args => graft.functions.unicodeExpressions.StripAccents(args.head)
      )
    )
    ext.injectFunction(
      fn(
        "topk_by",
        "topk_by(metric, id, k) - aggregate: k largest (metric, id) per group, bounded-heap partials",
        3,
        args =>
          TopKByAgg(args.head, args(1), intLit(args(2), "topk_by", "k"))
            .toAggregateExpression()
      )
    )
  }
}
