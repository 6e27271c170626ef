package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the native kernels — pure JVM functions,
  * so hundreds of cases run without Spark jobs.
  */
class HashKernelsPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val longArrays = Gen.listOf(Gen.long).map(l => new GenericArrayData(l.toArray))
  private val floatArrays =
    Gen.listOf(Gen.chooseNum(-100f, 100f)).map(l => new GenericArrayData(l.toArray))

  test("tokenHashes emits exactly one hash per space-separated token (split semantics)") {
    val texts = Gen.listOf(Gen.oneOf(Gen.alphaStr, Gen.const(""))).map(_.mkString(" "))
    check(Prop.forAll(texts) { s =>
      val n = HashKernels.tokenHashes(UTF8String.fromString(s)).numElements()
      n == s.split(" ", -1).length
    })
  }

  test("tokenHashes is injective on distinct token sequences (no accidental merges)") {
    val tokens = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    check(Prop.forAll(tokens, tokens) { (a, b) =>
      val ha = HashKernels.tokenHashes(UTF8String.fromString(a.mkString(" ")))
      val hb = HashKernels.tokenHashes(UTF8String.fromString(b.mkString(" ")))
      (a == b) == (ha.toLongArray.toSeq == hb.toLongArray.toSeq)
    })
  }

  test("shingleHashes count is max(0, n - k + 1)") {
    check(Prop.forAll(longArrays, Gen.chooseNum(1, 5)) { (arr, k) =>
      HashKernels.shingleHashes(arr, k).numElements() ==
        math.max(0, arr.numElements() - k + 1)
    })
  }

  test("minhash signature has fixed width and is elementwise monotone under union") {
    check(Prop.forAll(longArrays, longArrays, Gen.chooseNum(1, 32)) { (a, b, nh) =>
      val sa = HashKernels.minhashSignature(a, nh).toLongArray
      val union = new GenericArrayData(a.toLongArray ++ b.toLongArray)
      val su = HashKernels.minhashSignature(union, nh).toLongArray
      sa.length == nh && su.zip(sa).forall { case (u, x) => u <= x }
    })
  }

  test("minhash signature is permutation-invariant (set semantics)") {
    check(Prop.forAll(longArrays, Gen.long) { (a, seed) =>
      val shuffled = new GenericArrayData(new scala.util.Random(seed).shuffle(a.toLongArray.toSeq).toArray)
      HashKernels.minhashSignature(a, 16).toLongArray.toSeq ==
        HashKernels.minhashSignature(shuffled, 16).toLongArray.toSeq
    })
  }

  test("simhash of identical inputs is identical; hamming distance bounded by 64") {
    check(Prop.forAll(longArrays, longArrays) { (a, b) =>
      val ha = HashKernels.simhash64(a)
      val hb = HashKernels.simhash64(b)
      val hamming = java.lang.Long.bitCount(ha ^ hb)
      HashKernels.simhash64(a) == ha && hamming >= 0 && hamming <= 64
    })
  }

  test("dotProduct is symmetric and linear in scalar multiples") {
    check(Prop.forAll(floatArrays, floatArrays) { (a, b) =>
      val ab = HashKernels.dotProduct(a, b, true, true)
      val ba = HashKernels.dotProduct(b, a, true, true)
      math.abs(ab - ba) < 1e-6 * (1 + math.abs(ab))
    })
  }

  test("dotProductBoxed equals dotProduct when no element is null") {
    check(Prop.forAll(floatArrays, floatArrays) { (a, b) =>
      val boxed = HashKernels.dotProductBoxed(a, b, true, true)
      boxed != null && boxed.doubleValue() == HashKernels.dotProduct(a, b, true, true)
    })
  }

  // --- PQ kernels: random (m, ksub, subDim) geometry and vectors ---

  private val pqCase = for {
    m <- Gen.chooseNum(1, 6)
    ksub <- Gen.chooseNum(2, 12)
    subDim <- Gen.chooseNum(1, 5)
    flat <- Gen.listOfN(m * ksub * subDim, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
    vec <- Gen.listOfN(m * subDim, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
  } yield (m, ksub, subDim, flat, vec)

  test("pqEncode emits m codes in [0, ksub), each the per-subspace argmin") {
    check(Prop.forAll(pqCase) { case (m, ksub, subDim, flat, vec) =>
      val codes = HashKernels
        .pqEncode(new GenericArrayData(vec), flat, m, ksub, subDim)
        .toIntArray()
      codes.length == m && codes.zipWithIndex.forall { case (c, mi) =>
        def d2(kj: Int): Double = {
          var s = 0.0
          var i = 0
          while (i < subDim) {
            val diff = vec(mi * subDim + i) - flat((mi * ksub + kj) * subDim + i)
            s += diff * diff
            i += 1
          }
          s
        }
        c >= 0 && c < ksub && (0 until ksub).forall(kj => d2(c) <= d2(kj))
      }
    })
  }

  test("ADC via table lookup equals the direct dot with the reconstruction") {
    val twoVecs = for {
      (m, ksub, subDim, flat, q) <- pqCase
      cand <- Gen.listOfN(m * subDim, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
    } yield (m, ksub, subDim, flat, q, cand)
    check(Prop.forAll(twoVecs) { case (m, ksub, subDim, flat, q, cand) =>
      val codes = HashKernels.pqEncode(new GenericArrayData(cand), flat, m, ksub, subDim)
      val tab = HashKernels.pqAdcTable(new GenericArrayData(q), flat, m, ksub, subDim)
      val adc = HashKernels.pqAdcDot(codes, tab, ksub)
      val direct = codes.toIntArray().zipWithIndex.foldLeft(0.0) { case (acc, (code, mi)) =>
        var s = 0.0
        var i = 0
        while (i < subDim) {
          s += q(mi * subDim + i) * flat((mi * ksub + code) * subDim + i)
          i += 1
        }
        acc + s
      }
      adc == direct // same per-subspace accumulation order: bit-exact
    })
  }

  test("pqEncode and pqAdcTable reject ragged and null-slot vectors with null") {
    check(Prop.forAll(pqCase) { case (m, ksub, subDim, flat, vec) =>
      val short = new GenericArrayData(vec.dropRight(1))
      val nullSlot = new GenericArrayData(
        (null +: vec.drop(1).map(Double.box)).toArray[Any])
      val shortOk =
        HashKernels.pqEncode(short, flat, m, ksub, subDim) == null &&
          HashKernels.pqAdcTable(short, flat, m, ksub, subDim) == null
      val nullOk =
        HashKernels.pqEncode(nullSlot, flat, m, ksub, subDim) == null &&
          HashKernels.pqAdcTable(nullSlot, flat, m, ksub, subDim) == null
      shortOk && nullOk
    })
  }
}
