package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair every left row whose value falls inside
  * a right row's [lo, hi] interval.
  *
  * Spark plans a bare non-equi join as BroadcastNestedLoopJoin —
  * all-pairs work that dies at scale. This operator makes it an
  * EQUI-join: both sides key on fixed-width value buckets (a right
  * interval explodes to every bucket it covers), the bucket join
  * bounds candidates to same-bucket pairs, and the exact between
  * predicate rides the join condition. A matching (left, right) pair
  * meets in exactly ONE bucket — the left value's — so no post-join
  * dedup is needed.
  *
  * `bucketWidth` tunes candidate amplification: right rows explode to
  * ~(interval width / bucketWidth + 1) bucket rows, left rows to one.
  * Pick it near the typical interval width so both stay O(1). The
  * join itself is then an ordinary shuffle/broadcast equi-join that
  * AQE sizes — the 100 TB-safe shape for range predicates.
  */
object RangeJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val lb = left.withColumn("_bucket", floor(col(valueCol) / bucketWidth))
    val rb = right.withColumn(
      "_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth)))
    )
    lb.join(
        rb,
        lb("_bucket") === rb("_bucket") &&
          col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol)
      )
      .drop("_bucket")
  }
}
