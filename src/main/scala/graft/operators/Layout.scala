package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Sorting 100 TB by ONE column gives perfect file-level min/max
  * pruning on that column and none on any other; interleaving the
  * bits of several columns gives useful pruning on ALL of them at
  * once (the lakehouse OPTIMIZE ZORDER primitive). Files written from
  * a Z-ordered layout carry tight min/max ranges per dimension, so a
  * selective filter on any clustered column skips most files at scan
  * time.
  *
  * Determinism/portability: each column is affinely bucketed to
  * `bits` bits via its global min/max — `floor((x-min)*2^bits /
  * (max-min+1))` evaluated in double — then bit-interleaved with
  * plain integer arithmetic. For `bits <= 16` and column ranges
  * < 2^40 every intermediate is exact in double, so the identical
  * formula produces the identical key in any engine (the DuckDB
  * oracle runs the same expression).
  *
  * Scale shape: the min/max row is a group-less aggregate attached as
  * a 1-row broadcast (the audited scalar-attach pattern); the key is
  * then a pure scan-side projection. Clustering itself is ONE range
  * repartition on the key — the same shuffle a plain sort would cost,
  * buying pruning on every clustered dimension instead of one.
  */
object Layout {

  /** Morton-interleave pre-bucketed non-negative ints (column i
    * contributes bit j to output bit `j*n + i`).
    */
  private[operators] def interleave(scaled: Seq[Column], bits: Int): Column = {
    val n = scaled.size
    val terms = for {
      (c, i) <- scaled.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ + _)
  }

  /** Widest range (exclusive) for which the double-precision affine
    * bucket math is exact at `bits` output bits — see [[bucket]]'s
    * guard. The numerator (x - mn) * 2^bits must stay under 2^53 (the
    * double mantissa) for floor(N/D) to be exact; a flat 2^40 bound
    * was NOT sufficient for bits > 13 (e.g. bits=16 over a range in
    * [2^37, 2^40) puts the numerator past 2^53 and boundary values
    * land one bucket off).
    */
  private[operators] def maxExactRange(bits: Int): Double = math.pow(2, 53 - bits)

  /** Affine bucket of `x` into [0, 2^bits) given inclusive bounds.
    *
    * All three operands widen to long BEFORE subtracting — `x - mn` in
    * the source integral type overflows silently for an IntegerType
    * column spanning more than Int range (min near Int.MinValue, max
    * near Int.MaxValue). The documented <2^(53-bits) exactness range
    * is ENFORCED: a wider range raises at evaluation time instead of
    * returning buckets quantized by double rounding. The range check
    * runs in double (cannot overflow even for extreme longs).
    */
  private[operators] def bucket(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val xl = x.cast("long")
    val mnl = mn.cast("long")
    val mxl = mx.cast("long")
    val rangeOk = (mx.cast("double") - mn.cast("double")) < lit(maxExactRange(bits))
    when(
      !rangeOk,
      raise_error(lit(
        s"z-order bucket: column range exceeds 2^${53 - bits} — double bucketing " +
          s"at $bits bits would be inexact; pre-scale the column (e.g. divide to " +
          "a coarser unit) or lower bits"
      )).cast("long")
    ).otherwise(
      floor(
        ((xl - mnl).cast("double") * (1L << bits)) / (mxl - mnl + 1).cast("double")
      ).cast("long")
    )
  }

  /** Add a `zkey` column interleaving `cols` (integral columns) at
    * `bits` bits per dimension. Global per-column min/max ride a 1-row
    * broadcast; rows where any clustered column is NULL get a NULL key
    * (clusterByZOrder sorts them into the LAST slice via nulls-last).
    */
  def zorderKeyed(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.size >= 2, s"z-order needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    require(cols.size * bits <= 62, s"total key width ${cols.size * bits} exceeds 62 bits")
    val reserved = "zkey" +: cols.indices.flatMap(i => Seq(s"_mn$i", s"_mx$i"))
    val clash = df.columns.toSeq.intersect(reserved)
    require(
      clash.isEmpty,
      s"columns $clash collide with z-order scratch/output names — rename upstream"
    )
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(s"_mn$i"), max(col(c)).as(s"_mx$i"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      bucket(col(c), col(s"_mn$i"), col(s"_mx$i"), bits)
    }
    df.join(broadcast(bounds))
      .withColumn("zkey", interleave(scaled, bits))
      .drop(cols.indices.flatMap(i => Seq(s"_mn$i", s"_mx$i")): _*)
  }

  /** Cluster the frame for writing: range-partition on the Z-key into
    * `numPartitions` output slices and sort within each — one shuffle,
    * after which every written file covers a tight hyper-rectangle of
    * the clustered dimensions.
    */
  def clusterByZOrder(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      numPartitions: Int = 200
  ): DataFrame =
    zorderKeyed(df, cols, bits)
      .repartitionByRange(numPartitions, col("zkey").asc_nulls_last)
      .sortWithinPartitions(col("zkey").asc_nulls_last)
}
