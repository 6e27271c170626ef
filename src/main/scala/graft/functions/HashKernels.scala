package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels behind graft's custom expressions. A plain object
  * (no companion class) compiles with static forwarders, so whole-stage
  * generated Java calls these directly — the same code path as
  * interpreted eval, guaranteeing codegen/interpreted parity.
  */
object HashKernels {

  /** One XXH64 per space-separated token, hashed over the UTF-8 bytes
    * (split semantics of `split(text, " ")` incl. empty tokens).
    */
  def tokenHashes(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == ' '.toByte) {
        out += XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Chained XXH64 over each window of n consecutive token hashes. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](m - n + 1)
      var i = 0
      while (i < out.length) {
        var acc = 42L
        var j = 0
        while (j < n) {
          acc = XXH64.hashLong(arr.getLong(i + j), acc)
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Per-seed minima of XXH64(elem, seed) — the MinHash signature. */
  def minhashSignature(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val hs = XXH64.hashLong(h, s.toLong)
          if (hs < mins(s)) mins(s) = hs
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sign of the per-bit +1/-1 vote over the token hashes. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Left-to-right fold of sum(a[i]*b[i]) in double; `leftFloat` /
    * `rightFloat` select the element accessor per side. Only valid for
    * arrays whose schema guarantees non-null elements.
    */
  def dotProduct(
      xa: ArrayData,
      xb: ArrayData,
      leftFloat: Boolean,
      rightFloat: Boolean
  ): Double = {
    val n = math.min(xa.numElements(), xb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val va = if (leftFloat) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (rightFloat) xb.getFloat(i).toDouble else xb.getDouble(i)
      acc += va * vb
      i += 1
    }
    acc
  }

  /** Null-aware variant for arrays whose elements MAY be null: a null
    * slot makes the whole result null — matching the HOF
    * (`aggregate(... acc + a[i]*b[i])`) and DuckDB list_transform
    * semantics, where null propagates through the fold.
    */
  def dotProductBoxed(
      xa: ArrayData,
      xb: ArrayData,
      leftFloat: Boolean,
      rightFloat: Boolean
  ): java.lang.Double = {
    val n = math.min(xa.numElements(), xb.numElements())
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      i += 1
    }
    dotProduct(xa, xb, leftFloat, rightFloat)
  }
}
