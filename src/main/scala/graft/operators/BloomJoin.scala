package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: cut the fact side down BEFORE the
  * join shuffle using a compact bloom filter built over the (filtered)
  * dimension keys.
  *
  * Why not just broadcast the dim keys as a semi-join? A bloom filter
  * is FIXED-SIZE (numBits/8 bytes) no matter how many keys the dim
  * side has — a 100M-key build side that is too big to broadcast
  * exactly still fits in a ~1-8 MB bloom that ships to every executor
  * as a literal. False positives only let extra fact rows into the
  * join, where the exact equi-condition drops them — results are
  * bit-identical to the plain join (proven by the oracle), only the
  * shuffled row count changes.
  *
  * This is the manual form of Spark's runtime row-level filtering
  * (InjectRuntimeFilter), usable when the optimizer doesn't fire
  * (non-obvious selectivity, pre-aggregated build sides, reuse of one
  * bloom across several joins) — and the build is one bounded job: the
  * aggregate ships sketch-sized partials, never the key set.
  */
object BloomJoin {

  /** Build a bloom filter over `keyCol` (hashed to 64-bit). Driver
    * receives only the filter's byte array — `numBits / 8` bytes
    * regardless of row count.
    */
  def buildBloom(
      dim: DataFrame,
      keyCol: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024
  ): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems),
      Literal(numBits)
    ).toAggregateExpression()
    dim.select(GraftColumnBridge.column(agg)).head.getAs[Array[Byte]](0)
  }

  /** Membership test against a built bloom (same xxhash64 keying). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        GraftColumnBridge.expression(xxhash64(key))
      )
    )

  /** Equi-join `fact` to `dim` with the fact side pre-reduced by a
    * bloom over the dim keys. Inner join only (the reduction drops
    * fact rows that cannot match).
    */
  def bloomReducedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024
  ): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact
      .where(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
