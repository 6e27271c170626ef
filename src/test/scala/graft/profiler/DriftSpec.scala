package graft.profiler

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.{lit, when}

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("psi is ~0 for identical day distributions and large for a shifted one") {
    // days 1 and 2: identical values; day 3: shifted to the top bin
    val rows =
      (1 to 2).flatMap(d => Seq.fill(50)((ts(d), 1.0)) ++ Seq.fill(50)((ts(d), 2.0))) ++
        Seq.fill(100)((ts(3), 10.0))
    val df = rows.toDF("ts", "value")
    val psi = Drift
      .psiDrift(df, "ts", "value", bins = 10)
      .collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getDouble(1))
      .toMap
    assert(psi.size == 2) // day 2 vs 1, day 3 vs 2
    assert(psi("2024-01-02") == 0.0) // identical distributions
    assert(psi("2024-01-03") > 1.0) // mass moved to a different bin
  }

  test("psi pairs only consecutive calendar days") {
    val rows = Seq.fill(10)((ts(1), 1.0)) ++ Seq.fill(10)((ts(5), 2.0))
    val out = Drift.psiDrift(rows.toDF("ts", "value")).collect()
    assert(out.isEmpty) // day 5 has no day-4 partner
  }

  test("ks is 0 for identical days, 1 for disjoint supports, exact for a known shift") {
    // day 1 == day 2 (identical); day 3 disjoint from day 2;
    // day 4 vs day 3: half the mass moved from 10.0 to 20.0 -> KS = 0.5
    val rows =
      (1 to 2).flatMap(d => Seq.fill(30)((ts(d), 1.0)) ++ Seq.fill(30)((ts(d), 2.0))) ++
        Seq.fill(60)((ts(3), 10.0)) ++
        (Seq.fill(30)((ts(4), 10.0)) ++ Seq.fill(30)((ts(4), 20.0)))
    val ks = Drift
      .ksDrift(rows.toDF("ts", "value"))
      .collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getDouble(1))
      .toMap
    assert(ks.size == 3)
    assert(ks("2024-01-02") == 0.0)
    assert(ks("2024-01-03") == 1.0)
    assert(ks("2024-01-04") == 0.5)
  }

  test("ks pairs only consecutive calendar days and reports day sizes") {
    val rows = Seq.fill(7)((ts(1), 1.0)) ++ Seq.fill(9)((ts(2), 1.0)) ++
      Seq.fill(4)((ts(6), 2.0))
    val out = Drift.ksDrift(rows.toDF("ts", "value")).collect()
    assert(out.length == 1) // only day 2 has a day-1 partner
    assert(out.head.getTimestamp(0).toString.startsWith("2024-01-02"))
    assert(out.head.getLong(2) == 7L && out.head.getLong(3) == 9L)
  }

  test("gapFill carries the last observation forward within each key's own span") {
    val rows = Seq(
      (ts(1), "a", 10.0),
      (ts(2), "a", 20.0),
      (ts(5), "a", 50.0), // a: days 3, 4 filled with 20.0
      (ts(3), "b", 7.0) // b: single day, nothing to fill
    ).toDF("ts", "key", "value")
    val out = Drift
      .gapFill(rows, "ts", "value", Seq("key"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10), r.getDouble(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 10.0, false),
      ("a", "2024-01-02", 20.0, false),
      ("a", "2024-01-03", 20.0, true),
      ("a", "2024-01-04", 20.0, true),
      ("a", "2024-01-05", 50.0, false),
      ("b", "2024-01-03", 7.0, false)
    ))
  }

  test("missing days reports per-key calendar gaps inside the global span") {
    val rows = Seq(
      (ts(1), "a"),
      (ts(2), "a"),
      (ts(4), "a"), // a missing day 3
      (ts(1), "b"),
      (ts(4, 23), "b") // b missing days 2, 3
    )
    val got = Drift
      .missingDays(rows.toDF("ts", "k"), "ts", Seq("k"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)))
      .toSet
    assert(
      got == Set(
        ("a", "2024-01-03"),
        ("b", "2024-01-02"),
        ("b", "2024-01-03")
      )
    )
  }

  test("ks between groups: identical pair 0, disjoint pair 1, known shift exact") {
    val rows =
      Seq.fill(30)(("X", 1.0)) ++ Seq.fill(30)(("X", 2.0)) ++
        Seq.fill(30)(("Y", 1.0)) ++ Seq.fill(30)(("Y", 2.0)) ++
        Seq.fill(60)(("Z", 10.0)) ++
        (Seq.fill(30)(("W", 1.0)) ++ Seq.fill(30)(("W", 10.0)))
    val got = Drift
      .ksBetweenGroups(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    assert(got.size == 6, "all unordered pairs present")
    assert(got(("X", "Y")) == 0.0)
    assert(got(("X", "Z")) == 1.0 && got(("Y", "Z")) == 1.0)
    // W vs X: half of W's mass sits at 10 beyond X's support -> sup gap 0.5
    assert(got(("W", "X")) == 0.5)
    // W vs Z: W has half its mass below Z's support -> 0.5
    assert(got(("W", "Z")) == 0.5)
  }

  test("snapshot diff counts the planted edit script; null shifts are changes") {
    val a = Seq(
      (1L, Some("x"), Some("p")),
      (2L, Some("x"), Option.empty[String]), // null SHIFTS position in b
      (3L, Some("y"), Some("q")), // removed in b
      (4L, Some("z"), Some("r")) // unchanged
    ).toDF("k", "c1", "c2")
    val b = Seq(
      (1L, Some("x"), Some("p")), // wait -- changed below via c2
      (2L, Option.empty[String], Some("x")), // same strings, shifted slot
      (4L, Some("z"), Some("r")),
      (5L, Some("new"), Some("n")) // added
    ).toDF("k", "c1", "c2")
    val bMut = b.withColumn("c2",
      when($"k" === 1L, lit("P")).otherwise($"c2")) // k=1 becomes a real change
    val got = Drift
      .snapshotDiff(a, bMut, Seq("k"), Seq("c1", "c2"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .head
    // added: k=5; removed: k=3; changed: k=1 (edit) AND k=2 (null slot
    // shift — the sentinel makes it visible); unchanged: k=4
    assert(got == ((1L, 1L, 2L, 1L)))
  }

  test("snapshot diff property: random edit scripts reconstruct exactly") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rng.nextInt(40)
      val base = (1 to n).map(i => (i.toLong, s"v${rng.nextInt(1000)}"))
      // random disjoint edit script
      val ids = rng.shuffle(base.map(_._1)).toList
      val nRem = rng.nextInt(n / 3)
      val nChg = rng.nextInt(n / 3)
      val removed = ids.take(nRem).toSet
      val changed = ids.slice(nRem, nRem + nChg).toSet
      val nAdd = rng.nextInt(10)
      val b = base.filterNot(r => removed(r._1)).map {
        case (k, v) if changed(k) => (k, v + "_x")
        case r => r
      } ++ (1 to nAdd).map(i => ((n + i).toLong, "new"))
      val got = Drift
        .snapshotDiff(base.toDF("k", "c"), b.toDF("k", "c"), Seq("k"), Seq("c"))
        .as[(Long, Long, Long, Long)]
        .collect()
        .head
      assert(got == ((nAdd.toLong, nRem.toLong, nChg.toLong,
        (n - nRem - nChg).toLong)), s"trial $trial: $got")
    }
  }

  test("snapshot diff: identical NULL-key rows are unchanged, not add+remove") {
    val a = Seq((Option.empty[Long], "x"), (Some(1L), "y")).toDF("k", "c")
    val b = Seq((Option.empty[Long], "x"), (Some(1L), "y")).toDF("k", "c")
    val got = Drift
      .snapshotDiff(a, b, Seq("k"), Seq("c"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .head
    assert(got == ((0L, 0L, 0L, 2L)), s"null-safe key match, got $got")
  }

  test("novelty profile: first-seen counts, shares, and running distinct total") {
    // day1 {a,b} day2 {b,c} day3 {a} day4 {d,e,f}; a repeated within
    // day1 (distinct grain) and a null key (dropped)
    val df = Seq(
      (ts(1), Some("a")), (ts(1, 5), Some("a")), (ts(1), Some("b")),
      (ts(2), Some("b")), (ts(2), Some("c")),
      (ts(3), Some("a")),
      (ts(4), Some("d")), (ts(4), Some("e")), (ts(4), Some("f")),
      (ts(4), Option.empty[String])
    ).toDF("ts", "k")
    val got = Drift
      .noveltyProfile(df, "ts", "k")
      .orderBy("day")
      .select("n_values", "n_new", "new_share", "cum_distinct")
      .as[(Long, Long, Double, Long)]
      .collect()
      .toSeq
    assert(got == Seq(
      (2L, 2L, 1.0, 2L),
      (2L, 1L, 0.5, 3L),
      (1L, 0L, 0.0, 3L),
      (3L, 3L, 1.0, 6L)
    ))
  }
}
