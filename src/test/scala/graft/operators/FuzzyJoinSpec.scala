package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      )
    d(a.length)(b.length)
  }

  test("finds substitution, insertion, deletion pairs; excludes beyond-budget pairs") {
    val df = Seq(
      (1L, "red widget"),
      (2L, "red widgez"), // 1 substitution from 1
      (3L, "red widgets"), // 1 insertion from 1
      (4L, "red widge"), // 1 deletion from 1
      (5L, "blue bolt"), // far from everything
      (6L, "kitten"),
      (7L, "sitting") // lev 3 from kitten -> excluded at k=2
    ).toDF("id", "name")
    val pairs = FuzzyJoin
      .fuzzySelfPairs(df, "name", "id", maxEdits = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(pairs.keySet.forall { case (a, b) => a < b })
    assert(pairs((1L, 2L)) == 1 && pairs((1L, 3L)) == 1 && pairs((1L, 4L)) == 1)
    assert(pairs((3L, 4L)) == 2) // widgets vs widge
    assert(!pairs.contains((6L, 7L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("identical strings pair at distance 0") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "diff")).toDF("id", "name")
    val pairs = FuzzyJoin
      .fuzzySelfPairs(df, "name", "id", maxEdits = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("blocking is lossless: equals brute force on random short strings at k=1 and k=2") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc" // tiny alphabet forces many near-collisions
    val strs = (1L to 120L).map { i =>
      i -> (0 until (3 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(3))).mkString
    }
    val df = strs.toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin
        .fuzzySelfPairs(df, "name", "id", maxEdits = k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        d = lev(sa, sb) if d <= k
      } yield (ia, ib) -> d).toMap
      assert(got == want, s"k=$k mismatch: missing=${(want.keySet -- got.keySet).take(5)}")
    }
  }

  test("entity resolution chains transitive matches and elects by rank") {
    val df = Seq(
      (1L, "jon smith", 5.0),
      (2L, "john smith", 9.0), // lev 1 from 1, highest rank -> canonical
      (3L, "john smyth", 9.0), // lev 1 from 2, lev 3 from 1 (chained in); tie -> id 2 wins
      (4L, "alice jones", 7.0) // singleton
    ).toDF("id", "name", "score")
    val out = FuzzyJoin
      .resolveEntities(df, "name", "id", maxEdits = 2, rankCol = "score")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((1L, 2L, 3L)))
    assert(out(2L) == ((1L, 2L, 3L)))
    assert(out(3L) == ((1L, 2L, 3L)))
    assert(out(4L) == ((4L, 4L, 1L)))
  }

  test("deletion variants: count and membership for a known string") {
    val out = spark
      .range(1)
      .select(FuzzyJoin.deletionVariants(lit("abc"), 2).as("v"))
      .collect()
      .head
      .getSeq[String](0)
      .toSet
    // 0 deletions: abc; 1: ab ac bc; 2: a b c
    assert(out == Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    val empty = spark
      .range(1)
      .select(FuzzyJoin.deletionVariants(lit(""), 2).as("v"))
      .collect()
      .head
      .getSeq[String](0)
      .toSet
    assert(empty == Set(""))
  }
}
