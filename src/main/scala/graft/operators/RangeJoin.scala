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

  /** @param maxBucketsPerInterval hard ceiling on how many bucket rows
    *   a single interval may explode to — an interval that is very wide
    *   relative to `bucketWidth` would otherwise materialize an
    *   enormous per-row array (memory blows long before Spark's 2^31
    *   element hard error). Exceeding it raises at execution time:
    *   choose a larger `bucketWidth` for such data.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Long = 1 << 16
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // withColumn would silently REPLACE a user column of the scratch
    // name and the trailing drop would erase it from the output — the
    // same guard every other scratch-column operator here carries
    require(
      !left.columns.contains("_bucket") && !right.columns.contains("_bucket"),
      "column '_bucket' collides with RangeJoin's scratch name — rename upstream"
    )
    val loB = floor(col(loCol) / bucketWidth)
    val hiB = floor(col(hiCol) / bucketWidth)
    val lb = left.withColumn("_bucket", floor(col(valueCol) / bucketWidth))
    // inverted intervals (lo > hi) match nothing — drop them BEFORE the
    // explode, where sequence() would otherwise generate a descending
    // bucket range only filtered out post-join
    val rb = right
      .where(col(loCol) <= col(hiCol))
      .withColumn(
        "_bucket",
        explode(
          when(hiB - loB < lit(maxBucketsPerInterval), sequence(loB, hiB))
            .otherwise(raise_error(format_string(
              "RangeJoin: interval [%s, %s] spans more than " +
                s"$maxBucketsPerInterval buckets of width $bucketWidth — " +
                "increase bucketWidth or maxBucketsPerInterval",
              col(loCol),
              col(hiCol)
            ))))
      )
    lb.join(
        rb,
        lb("_bucket") === rb("_bucket") &&
          col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol)
      )
      .drop("_bucket")
  }
}
