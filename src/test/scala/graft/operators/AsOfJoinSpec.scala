package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, t("2025-01-01 10:00:00"), 100.0),
    (1L, t("2025-01-01 10:05:00"), 101.0),
    (2L, t("2025-01-01 10:02:00"), 200.0)
  ).toDF("k", "qts", "px")

  private val trades = Seq(
    (10L, 1L, t("2025-01-01 10:00:00"), 5.0), // equal ts -> inclusive match
    (11L, 1L, t("2025-01-01 10:03:00"), 6.0), // between quotes -> 10:00 quote
    (12L, 1L, t("2025-01-01 10:07:00"), 7.0), // after both -> 10:05 quote
    (13L, 2L, t("2025-01-01 10:01:00"), 8.0), // before any quote -> null
    (14L, 3L, t("2025-01-01 10:00:00"), 9.0)  // key with no quotes -> null
  ).toDF("id", "k", "tts", "amt")

  test("as-of join attaches the latest reference row at or before each probe row") {
    val got = AsOfJoin
      .asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px"))
      .orderBy("id")
      .select("id", "qts", "px")
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.toString), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      (10L, Some("2025-01-01 10:00:00.0"), Some(100.0)),
      (11L, Some("2025-01-01 10:00:00.0"), Some(100.0)),
      (12L, Some("2025-01-01 10:05:00.0"), Some(101.0)),
      (13L, None, None),
      (14L, None, None)
    ))
  }

  test("tolerance nulls out stale matches") {
    val got = AsOfJoin
      .asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px"),
        tolerance = Some(expr("INTERVAL 2 MINUTES")))
      .orderBy("id")
      .collect()
      .map(r => r.getLong(0) -> !r.isNullAt(5))
    // trade 12 is 2min after the 10:05 quote (within), trade 11 is 3min
    // after the 10:00 quote (stale)
    assert(got.toSeq == Seq(10L -> true, 11L -> false, 12L -> true, 13L -> false, 14L -> false))
  }

  test("all left columns and rows are preserved (left-join semantics)") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tts", "qts", Seq("px"))
    assert(out.columns.toSeq == Seq("id", "k", "tts", "amt", "qts", "px"))
    assert(out.count() == trades.count())
  }

  test("NULL join keys never match (join semantics), left rows preserved") {
    val l = Seq(
      (1L, Some(1L), t("2025-01-01 10:00:00"), 1.0),
      (2L, None: Option[Long], t("2025-01-01 10:00:00"), 2.0) // null key
    ).toDF("id", "k", "tts", "amt")
    val r = Seq(
      (Some(1L), t("2025-01-01 09:00:00"), 10.0),
      (None: Option[Long], t("2025-01-01 09:00:00"), 99.0) // null-key ref row
    ).toDF("k", "qts", "px")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "tts", "qts", Seq("px"))
      .orderBy("id").collect()
    assert(got.length == 2) // left-join: the null-key left row survives...
    assert(got(0).getDouble(5) == 10.0)
    assert(got(1).isNullAt(5)) // ...but never matches a null-key reference
  }

  test("NULL right TIMES never match — they must not attach as the as-of row") {
    // a null right time sorts FIRST in the ascending sweep; pre-fix it
    // attached (with a NULL matched timestamp) to any left row lacking
    // a real earlier right row — DuckDB ASOF says no match at all
    val l = Seq((1L, 1L, t("2025-01-01 10:00:00"), 1.0))
      .toDF("id", "k", "tts", "amt")
    val r = Seq((1L, null.asInstanceOf[java.sql.Timestamp], 99.0))
      .toDF("k", "qts", "px")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "tts", "qts", Seq("px")).collect()
    assert(got.length == 1 && got(0).isNullAt(5),
      s"null-time reference row must not match, got ${got.toSeq}")
  }

  test("colliding right payload names are rejected") {
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes.withColumnRenamed("px", "amt"), Seq("k"), "tts", "qts", Seq("amt"))
    }
    assert(ex.getMessage.contains("collides"))
  }

  test("left or key columns named like scratch columns are rejected") {
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades.withColumnRenamed("amt", "_m"), quotes, Seq("k"), "tts", "qts", Seq("px"))
    }
    assert(ex.getMessage.contains("scratch"))
    val ex2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(
        trades.withColumnRenamed("k", "_t"),
        quotes.withColumnRenamed("k", "_t"),
        Seq("_t"),
        "tts",
        "qts",
        Seq("px")
      )
    }
    assert(ex2.getMessage.contains("scratch"))
  }
}
