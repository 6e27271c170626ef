package graft.profiler

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a mergeable Spark Aggregator — the
  * point-frequency companion to [[HeavyHitters]]: Misra-Gries answers
  * "what are the top items", Count-Min answers "how often did THIS
  * item occur" for any item, in depth*width counters regardless of
  * domain size.
  *
  * Guarantees (Cormode & Muthukrishnan 2005): estimates never
  * undercount, and overcount by at most e*N/width with probability
  * >= 1 - (1/2)^depth per query (N = group total). Partial sketches
  * add counter-wise, so Spark's two-phase aggregation ships
  * depth*width longs per partition-group — constant in both corpus
  * and domain size, the 100 TB shape.
  *
  * Row r hashes the item's UTF-8 bytes with XXH64 seed r — the same
  * kernel family as the dedup signatures, so estimates are
  * reproducible across any JVM.
  */
object CountMin {

  private def bucket(item: String, row: Int, width: Int): Int = {
    val u = UTF8String.fromString(item)
    val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), row.toLong)
    (((h % width) + width) % width).toInt
  }

  class Sketch(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 8, s"width must be >= 8, got $width")

    def zero: Array[Long] = new Array[Long](depth * width)

    def reduce(buf: Array[Long], item: String): Array[Long] = {
      if (item != null) {
        var r = 0
        while (r < depth) {
          buf(r * width + bucket(item, r, width)) += 1
          r += 1
        }
      }
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: `df.groupBy(...).agg(sketch(d, w)(col))` yields
    * the flattened depth*width counter array.
    */
  def sketch(depth: Int = 4, width: Int = 256) =
    udaf(new Sketch(depth, width), Encoders.STRING)

  /** Point-frequency estimate from a materialized sketch (never
    * undercounts; overcounts bounded as documented above).
    */
  def estimate(counts: Seq[Long], depth: Int, width: Int, item: String): Long = {
    require(counts.length == depth * width, s"sketch size ${counts.length} != $depth*$width")
    (0 until depth).map(r => counts(r * width + bucket(item, r, width))).min
  }
}
