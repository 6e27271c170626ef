package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight join diagnostics (SURVEY §2.3).
  *
  * Before shuffling two 100 TB tables on a key, the question is not
  * "will it work" but "how many rows come out, and which keys melt a
  * reducer". Both are answerable EXACTLY from two cheap per-key count
  * aggregations — a tiny fraction of the join's own cost — because the
  * equi-join output size is sum over keys of n_left(k) * n_right(k).
  * The output ranks the keys a salting strategy (see [[SkewJoin]]) or
  * an AQE skew split would have to absorb.
  */
object JoinStats {

  import graft.functions.round6

  /** Exact equi-join output cardinality, per contributing key: the top
    * `topK` keys by induced output rows, with each key's share of the
    * total. `(key, n_left, n_right, out_rows, share)`, ordered by
    * (out_rows DESC, key) — ties break on the key so the cut line is
    * reproducible.
    *
    * Scale shape: one map-side-combinable count per input (shuffled on
    * the key each side carries anyway), an equi-join of the two
    * per-key tables, and a global top-k (TakeOrdered — no full sort).
    * The per-key table is persisted for the duration: the total-rows
    * scalar and the ranked output both read it, and re-deriving it
    * would re-scan both inputs. Cache lifetime is caller-owned (same
    * contract as [[Graph.pageRank]]).
    */
  def joinCardinality(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topK: Int = 25
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val l = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val per = l
      .join(r, "key")
      .select(
        col("key"),
        col("n_left"),
        col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows")
      )
      .persist()
    val total = per.agg(sum(col("out_rows")).as("_total"))
    per
      .crossJoin(broadcast(total))
      .select(
        col("key"),
        col("n_left"),
        col("n_right"),
        col("out_rows"),
        round6(col("out_rows") / col("_total")).as("share")
      )
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topK)
  }
}
