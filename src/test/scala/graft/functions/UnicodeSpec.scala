package graft.functions

import graft.SparkSpec
import graft.text.Text
import org.apache.spark.sql.functions._

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "re\u0301sume\u0301" // e + combining acute
  private val composed = "r\u00e9sum\u00e9" // precomposed \u00e9

  test("unicodeNormalize: NFC composes, NFD decomposes, NFKC folds compatibility variants") {
    val df = Seq((1L, decomposed, "ﬁve ５ ㎞")).toDF("id", "a", "b")
    val got = df
      .select(
        Text.unicodeNormalize(col("a")).as("nfc"),
        Text.unicodeNormalize(col("a"), "NFD").as("nfd"),
        Text.unicodeNormalize(col("a"), "NFKC").as("nfkc_a"),
        Text.unicodeNormalize(col("b"), "NFKC").as("nfkc_b"),
        Text.unicodeNormalize(col("b"), "NFC").as("nfc_b")
      )
      .collect()(0)
    assert(got.getString(0) == composed)
    assert(got.getString(1) == decomposed)
    assert(got.getString(2) == composed) // NFKC includes canonical composition
    assert(got.getString(3) == "five 5 km") // ﬁ -> fi, fullwidth 5 -> 5, ㎞ -> km
    assert(got.getString(4) == "ﬁve ５ ㎞") // NFC leaves compat chars
  }

  test("unicodeNormalize makes spelling variants hash-identical (the dedup motivation)") {
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
    val keys = df
      .select(md5(Text.unicodeNormalize(col("t"))).as("k"))
      .distinct()
      .count()
    assert(keys == 1L)
    // without normalization they are two different byte strings
    assert(df.select(md5(col("t")).as("k")).distinct().count() == 2L)
  }

  test("stripAccents folds Latin accents, passes ASCII and unaccented text through") {
    val df = Seq((1L, "éàüñ", decomposed, "plain ascii", "ﬁ"))
      .toDF("id", "acc", "dec", "ascii", "lig")
    val got = df
      .select(
        Text.stripAccents(col("acc")),
        Text.stripAccents(col("dec")),
        Text.stripAccents(col("ascii")),
        Text.stripAccents(col("lig"))
      )
      .collect()(0)
    assert(got.getString(0) == "eaun")
    assert(got.getString(1) == "resume") // handles decomposed input directly
    assert(got.getString(2) == "plain ascii")
    assert(got.getString(3) == "ﬁ") // ligature is not an accent
  }

  test("kernels are null-safe, idempotent, and reject bad forms at construction") {
    val df = Seq((1L, Option.empty[String]), (2L, Some(decomposed))).toDF("id", "t")
    val got = df
      .orderBy("id")
      .select(
        Text.unicodeNormalize(col("t")),
        Text.stripAccents(col("t")),
        Text.unicodeNormalize(Text.unicodeNormalize(col("t")))
      )
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getString(2) == composed) // NFC(NFC(x)) == NFC(x)
    intercept[IllegalArgumentException](Text.unicodeNormalize(col("t"), "NFX"))
  }
}
