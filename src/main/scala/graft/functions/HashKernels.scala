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

  /** Ids of the `take` nearest centroids to `v` by squared L2 — the
    * IVF coarse-quantizer cell assignment. `cents` is the centroid
    * matrix flattened row-major with stride `dim` (bound once into the
    * generated code as a reference object, not per-row). Vectors
    * shorter than `dim` or containing a null slot in the first `dim`
    * positions return null (no meaningful cell); longer vectors use
    * their first `dim` components. Ties break toward the lower cell
    * id. `take` is clamped to the centroid count.
    */
  def nearestCells(v: ArrayData, cents: Array[Double], dim: Int, take: Int): ArrayData = {
    val vv = densePrefix(v, dim)
    if (vv == null) return null
    val nlist = cents.length / dim
    val ds = new Array[Double](nlist)
    var j = 0
    while (j < nlist) {
      var d = 0.0
      var k = 0
      val off = j * dim
      while (k < dim) { val diff = vv(k) - cents(off + k); d += diff * diff; k += 1 }
      ds(j) = d
      j += 1
    }
    // selection of the t smallest: t is 1..nprobe (tiny), so a linear
    // scan per slot beats building a heap
    val t = math.min(take, nlist)
    val out = new Array[Int](t)
    val used = new Array[Boolean](nlist)
    var s = 0
    while (s < t) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var j2 = 0
      while (j2 < nlist) {
        if (!used(j2) && ds(j2) < bestD) { bestD = ds(j2); best = j2 }
        j2 += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Copy the first `dim` doubles of `v` out, or null for ragged /
    * null-slot vectors — the shared dirty-input contract of every
    * vector kernel here ([[nearestCells]], the PQ family).
    */
  private def densePrefix(v: ArrayData, dim: Int): Array[Double] = {
    if (v.numElements() < dim) return null
    val vv = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      vv(i) = v.getDouble(i)
      i += 1
    }
    vv
  }

  /** Product-quantization encode: for each of the `m` subspaces of
    * width `subDim`, the id of the nearest (squared L2) of its `ksub`
    * sub-centroids. `books` is the codebook tensor flattened
    * subspace-major: entry (mi, kj, d) at mi*ksub*subDim + kj*subDim
    * + d. Output: m codes in [0, ksub). Null for ragged/null-slot
    * vectors (same contract as [[nearestCells]]).
    */
  def pqEncode(v: ArrayData, books: Array[Double], m: Int, ksub: Int, subDim: Int): ArrayData = {
    val vv = densePrefix(v, m * subDim)
    if (vv == null) return null
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val vOff = mi * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var kj = 0
      while (kj < ksub) {
        val bOff = (mi * ksub + kj) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = vv(vOff + i) - books(bOff + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = kj }
        kj += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance table for one query vector: dot products of
    * each query subvector with every sub-centroid, flattened like the
    * codebook (entry (mi, kj) at mi*ksub + kj). One table per QUERY
    * row; candidate scoring is then `m` lookups ([[pqAdcDot]]) instead
    * of a `dim`-wide float dot — the PQ bandwidth win.
    */
  def pqAdcTable(v: ArrayData, books: Array[Double], m: Int, ksub: Int, subDim: Int): ArrayData = {
    val vv = densePrefix(v, m * subDim)
    if (vv == null) return null
    val out = new Array[Double](m * ksub)
    var mi = 0
    while (mi < m) {
      val vOff = mi * subDim
      var kj = 0
      while (kj < ksub) {
        val bOff = (mi * ksub + kj) * subDim
        var s = 0.0
        var i = 0
        while (i < subDim) { s += vv(vOff + i) * books(bOff + i); i += 1 }
        out(mi * ksub + kj) = s
        kj += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: sum over subspaces of the query table entry for the
    * candidate's code — dot(query, reconstruction(codes)) in m adds.
    * `codes` comes from [[pqEncode]], `table` from [[pqAdcTable]]
    * built with the same codebooks, so bounds hold by construction.
    */
  def pqAdcDot(codes: ArrayData, table: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var mi = 0
    while (mi < m) {
      s += table.getDouble(mi * ksub + codes.getInt(mi))
      mi += 1
    }
    s
  }

}
