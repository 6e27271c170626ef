package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  // user 1: full ordered funnel; user 2: click before view (click must
  // not count until re-clicked — it never is, so stops at view);
  // user 3: view+click at the SAME instant (strict order -> click does
  // not advance); user 4: no funnel events at all.
  private val funnelEvents = Seq(
    (1L, 1L, "view", t("2025-01-01 10:00:00")),
    (2L, 1L, "click", t("2025-01-01 10:01:00")),
    (3L, 1L, "purchase", t("2025-01-01 10:02:00")),
    (4L, 2L, "click", t("2025-01-01 09:00:00")),
    (5L, 2L, "view", t("2025-01-01 09:30:00")),
    (6L, 2L, "purchase", t("2025-01-01 09:45:00")),
    (7L, 3L, "view", t("2025-01-01 08:00:00")),
    (8L, 3L, "click", t("2025-01-01 08:00:00")),
    (9L, 4L, "error", t("2025-01-01 07:00:00"))
  ).toDF("event_id", "user_id", "event_type", "ts")

  test("funnel advances only on strictly time-ordered steps") {
    val got = EventAnalytics
      .funnelSteps(funnelEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel accepts epoch-long event times like interArrival does") {
    // telemetry frequently carries epoch-seconds BIGINT; without the
    // timestamp cast the fold seed's null::timestamp cannot coerce
    // against struct<…, last_ts: bigint> and analysis fails
    val epochEvents = funnelEvents
      .withColumn("ts", unix_timestamp(col("ts")))
    val got = EventAnalytics
      .funnelSteps(epochEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
    val daily = EventAnalytics
      .funnelStepsDaily(epochEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect()
    assert(daily.nonEmpty)
  }

  test("funnel emits zero-filled rows when nobody converts") {
    val got = EventAnalytics
      .funnelSteps(funnelEvents, "user_id", "event_type", "ts",
        Seq("purchase", "error", "signup"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("purchase", 2L), ("error", 0L), ("signup", 0L)))
  }

  private val retEvents = Seq(
    // user 1 first active day 1, returns day 2 and day 4 (twice - dedup)
    (1L, t("2025-03-01 10:00:00")),
    (1L, t("2025-03-02 09:00:00")),
    (1L, t("2025-03-04 09:00:00")),
    (1L, t("2025-03-04 23:00:00")),
    // user 2 first active day 2 only
    (2L, t("2025-03-02 12:00:00"))
  ).toDF("user_id", "ts")

  test("retention cohorts count each returning user once per day") {
    val got = EventAnalytics
      .retentionCohorts(retEvents, "user_id", "ts", maxOffsetDays = 7)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2025-03-01 00:00:00.0", 0L, 1L),
      ("2025-03-01 00:00:00.0", 1L, 1L),
      ("2025-03-01 00:00:00.0", 3L, 1L),
      ("2025-03-02 00:00:00.0", 0L, 1L)
    ))
  }

  test("rolling distinct counts trailing-window users on observed days only") {
    val got = EventAnalytics
      .rollingDistinct(retEvents, "user_id", "ts", windowDays = 3)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    // day 1: {u1}; day 2: {u1,u2}; day 4: window [2,4] -> {u1,u2}
    assert(got.toSeq == Seq(
      ("2025-03-01 00:00:00.0", 1L),
      ("2025-03-02 00:00:00.0", 2L),
      ("2025-03-04 00:00:00.0", 2L)
    ))
  }

  test("HLL rolling distinct tracks the exact operator within tolerance") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val exact = EventAnalytics
      .rollingDistinct(events, "user_id", "ts", windowDays = 7)
      .collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1))
      .toMap
    val approx = EventAnalytics
      .rollingDistinctHll(events, "user_id", "ts", windowDays = 7)
      .collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1).toDouble)
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (day, est) =>
      val ex = exact(day).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"day $day: est $est vs exact $ex")
    }
  }

  private val attrEvents = Seq(
    // purchase 3 attributes to click 2 (latest before it, within window)
    (1L, 1L, "click", t("2025-01-01 10:00:00")),
    (2L, 1L, "click", t("2025-01-01 10:30:00")),
    (3L, 1L, "purchase", t("2025-01-01 10:40:00")),
    // purchase 5 outside the 1h window -> not attributed (lag present)
    (4L, 2L, "click", t("2025-01-01 08:00:00")),
    (5L, 2L, "purchase", t("2025-01-01 09:30:00")),
    // purchase 6 with no prior click -> null lag, not attributed
    (6L, 3L, "purchase", t("2025-01-01 09:00:00")),
    // same-instant click (id 7 < id 8) IS "before" under (ts, id) order
    (7L, 4L, "click", t("2025-01-01 11:00:00")),
    (8L, 4L, "purchase", t("2025-01-01 11:00:00"))
  ).toDF("event_id", "user_id", "event_type", "ts")

  test("event transitions count ordered pairs per user and row-normalize") {
    // user 1: view->click->view ; user 2: view->click
    val ev = Seq(
      (1L, 1L, "view", t("2025-01-01 10:00:00")),
      (2L, 1L, "click", t("2025-01-01 10:01:00")),
      (3L, 1L, "view", t("2025-01-01 10:02:00")),
      (4L, 2L, "view", t("2025-01-01 09:00:00")),
      (5L, 2L, "click", t("2025-01-01 09:01:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics
      .eventTransitions(ev, "user_id", "event_id", "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "view") -> ((1L, 1.0))
    ))
  }

  test("last-touch attribution picks the latest prior touch within the window") {
    val got = EventAnalytics
      .lastTouchAttribution(attrEvents, "user_id", "event_id", "event_type",
        "ts", "click", "purchase", windowSec = 3600L)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (3L, Some(600L * 1000000L), true),
      (5L, Some(5400L * 1000000L), false),
      (6L, None, false),
      (8L, Some(0L), true)
    ))
  }

  test("conversion latency: first-view to first-later-purchase, hand-computed percentiles") {
    // user 1 converts in 120s; user 2's purchase follows its first view
    // (15 min = 900s); user 3 never purchases; user 4 has no view.
    // Latencies {120, 900}: p50 interpolates to 510, mean 510.
    val got = EventAnalytics
      .conversionLatency(funnelEvents, "user_id", "event_type", "ts",
        "view", "purchase")
      .as[(String, String, Long, Long, Double, Double, Double, Double)]
      .collect()
      .head
    assert(got._1 == "view" && got._2 == "purchase")
    assert(got._3 == 3L, "three users have a first view")
    assert(got._4 == 2L, "two of them purchase afterwards")
    assert(got._6 == 510.0 && got._8 == 510.0)
    assert(got._5 == 120.0 + 0.25 * 780.0 && got._7 == 120.0 + 0.9 * 780.0)
  }

  test("conversion latency: a purchase AT the first view's instant does not count") {
    val ev = Seq(
      (1L, 1L, "view", t("2025-01-01 10:00:00")),
      (2L, 1L, "purchase", t("2025-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics
      .conversionLatency(ev, "user_id", "event_type", "ts", "view", "purchase")
      .as[(String, String, Long, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
      .head
    assert(got._3 == 1L && got._4 == 0L)
    assert(got._5.isEmpty && got._8.isEmpty, "no converters -> null stats")
  }

  test("contribution analysis: zero-filled vanished segment is the culprit") {
    val events = Seq(
      ("A", t("2025-01-01 10:00:00"), 5.0), ("A", t("2025-01-01 11:00:00"), 5.0),
      ("B", t("2025-01-01 10:00:00"), 20.0),
      ("A", t("2025-01-02 10:00:00"), 16.0), ("B", t("2025-01-02 10:00:00"), 18.0),
      ("B", t("2025-01-03 10:00:00"), 30.0) // A vanishes on day 3
    ).toDF("event_type", "ts", "value")
    val got = EventAnalytics
      .contributionAnalysis(events, "ts", "event_type", "value")
      .orderBy("day", "segment")
      .as[(java.sql.Timestamp, String, Double, Double, Double, Double, Option[Double])]
      .collect()
      .map(r => (r._1.toString.take(10), r._2, r._5, r._6, r._7.get))
      .toSeq
    assert(got == Seq(
      ("2025-01-02", "A", 6.0, 4.0, 1.5),
      ("2025-01-02", "B", -2.0, 4.0, -0.5),
      ("2025-01-03", "A", -16.0, -4.0, 4.0),
      ("2025-01-03", "B", 12.0, -4.0, -3.0)
    ))
  }

  test("concurrency: open intervals (NULL end) are excluded, not sorted first") {
    val iv = Seq(
      ("A", Some(t("2025-01-01 10:00:30")), Some(t("2025-01-01 10:05:10"))),
      ("open", Some(t("2025-01-01 10:01:00")), Option.empty[java.sql.Timestamp])
    ).toDF("id", "s", "e")
    val got = EventAnalytics
      .concurrencyProfile(iv, "s", "e", grain = "minute")
      .orderBy("t")
      .as[(java.sql.Timestamp, Long, Long, Long, Long)]
      .collect()
    assert(got.forall(_._1 != null), "no NULL bucket row")
    assert(got.map(_._5).min == 0L && got.map(_._5).max == 1L,
      "counts never understated by a leading NULL -1")
  }

  test("contribution: the segment cap cannot falsify total_delta") {
    val events = Seq(
      ("A", t("2025-01-01 10:00:00"), 10.0), ("B", t("2025-01-01 10:00:00"), 5.0),
      ("A", t("2025-01-02 10:00:00"), 13.0), ("B", t("2025-01-02 10:00:00"), 9.0)
    ).toDF("event_type", "ts", "value")
    // cap keeps only segment A's rows; the total must still be the
    // REAL day-over-day move (+3 +4 = +7), not A's +3
    val got = EventAnalytics
      .contributionAnalysis(events, "ts", "event_type", "value", maxSegments = 1)
      .as[(java.sql.Timestamp, String, Double, Double, Double, Double, Option[Double])]
      .collect()
    assert(got.length == 1 && got.head._2 == "A")
    assert(got.head._6 == 7.0, s"true total, got ${got.head._6}")
    assert(got.head._7.contains(3.0 / 7.0 match { case x => math.rint(x * 1e6) / 1e6 }))
  }

  test("rfm: quartile-threshold scores produce the diagonal segments") {
    // A: 4 events newest day, total 40 -> 444; D: 1 old cheap event -> 111
    def ev(u: Long, day: Int, n: Int, v: Double) =
      (1 to n).map(i => (u, t(f"2025-01-$day%02d 0$i:00:00"), v))
    val events = (ev(1L, 10, 4, 10.0) ++ ev(2L, 9, 3, 5.0) ++
      ev(3L, 8, 2, 2.0) ++ ev(4L, 7, 1, 1.0))
      .toDF("user_id", "ts", "value")
    val got = EventAnalytics
      .rfmSegments(events, "user_id", "ts", "value")
      .orderBy("user")
      .as[(Long, Long, Long, Double, Int, Int, Int, String)]
      .collect()
      .map(r => (r._1, r._2, r._3, r._4, r._8))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 4L, 40.0, "444"),
      (2L, 1L, 3L, 15.0, "333"),
      (3L, 2L, 2L, 4.0, "222"),
      (4L, 3L, 1L, 1.0, "111")
    ))
  }

  test("concurrency: sweep-line counts active-at-bucket-end intervals") {
    // A spans 10:00-10:05, B starts AND ends inside 10:02 (nets 0),
    // C starts the minute A ends (handover keeps concurrency flat)
    val iv = Seq(
      ("A", t("2025-01-01 10:00:30"), t("2025-01-01 10:05:10")),
      ("B", t("2025-01-01 10:02:00"), t("2025-01-01 10:02:40")),
      ("C", t("2025-01-01 10:05:00"), t("2025-01-01 10:07:00"))
    ).toDF("id", "s", "e")
    val got = EventAnalytics
      .concurrencyProfile(iv, "s", "e", grain = "minute")
      .orderBy("t")
      .as[(java.sql.Timestamp, Long, Long, Long, Long)]
      .collect()
      .map(r => (r._1.toString, r._2, r._3, r._4, r._5))
      .toSeq
    assert(got == Seq(
      ("2025-01-01 10:00:00.0", 1L, 0L, 1L, 1L),
      ("2025-01-01 10:02:00.0", 1L, 1L, 0L, 1L),
      ("2025-01-01 10:05:00.0", 1L, 1L, 0L, 1L),
      ("2025-01-01 10:07:00.0", 0L, 1L, -1L, 0L)
    ))
  }
}
