package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein,
  * SIGIR 1998) over one query's bounded candidate set — the
  * diversity-aware rerank behind [[graft.similarity.Similarity
  * .mmrRerank]]: at each step pick the unselected candidate maximizing
  *
  *   score = λ·rel − (1−λ)·max_{s ∈ selected} cos(cand, s),
  *
  * i.e. relevance discounted by redundancy against what is already
  * chosen. One JVM loop per query row over ≤ m candidates — the
  * iterative argmax is exactly what SQL/DataFrame operators can't
  * express, so it runs as a codegen'd kernel the same way BPE encode
  * does.
  *
  * Engine parity: `rel` arrives already round6'd from the candidate
  * stage; pairwise cosines are computed with the same left-to-right
  * f32→f64 product fold as [[hashExpressions.DotProduct]] and round6'd
  * with Spark's own double-round semantics (BigDecimal HALF_UP on
  * v·10⁶), so scores — and therefore the greedy choice sequence — are
  * reproducible on any partitioning and against the SQL oracle.
  * Selection is input-order-independent: ties break on the smaller id,
  * so the nondeterministic `collect_list` order never shows.
  */
object MmrKernel {

  /** Spark-column `round(v * 1e6) / 1e6` reproduced in the JVM — the
    * shared engine-parity rounder (one definition, see functions).
    */
  private def round6(v: Double): Double = graft.functions.round6Jvm(v)

  /** `cands`: array of struct (id: long, rel: double, vec:
    * array<float>). Returns ≤ k structs (neighbor_id, rel, mmr_score,
    * rank) in selection order.
    *
    * NULL-safety: the input type may carry nullable entries/fields
    * (an outer corpus join can leave a NULL embedding on a candidate);
    * such candidates are UNSCORABLE — no relevance or no vector to
    * diversify against — and are skipped rather than crashing the
    * task or poisoning the argmax. Callers that must not lose
    * candidates silently should assert non-NULL upstream; the skip
    * only ever shrinks the result below k, never invents a score.
    */
  def select(cands: ArrayData, k: Int, lambda: Double): ArrayData = {
    val raw = cands.numElements()
    val ids = new Array[Long](raw)
    val rels = new Array[Double](raw)
    val vecs = new Array[Array[Float]](raw)
    var n = 0 // valid candidates after the NULL skip
    var i = 0
    while (i < raw) {
      if (!cands.isNullAt(i)) {
        val r = cands.getStruct(i, 3)
        if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)) {
          val av = r.getArray(2)
          var ok = true
          var j = 0
          val len = av.numElements()
          while (ok && j < len) { ok = !av.isNullAt(j); j += 1 }
          // a NaN relevance is skipped like a NULL one: selected, it
          // would lock rank 1 forever (no finite score compares > NaN
          // and the == tie-break never fires) and emit a NaN mmr_score
          if (ok && !java.lang.Double.isNaN(r.getDouble(1))) {
            ids(n) = r.getLong(0)
            rels(n) = r.getDouble(1)
            vecs(n) = av.toFloatArray()
            n += 1
          }
        }
      }
      i += 1
    }
    val take = math.min(k, n)
    if (take == 0) return new GenericArrayData(Array.empty[Any])
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = vecs(i)
      var s = 0.0
      var j = 0
      while (j < v.length) { s += v(j).toDouble * v(j).toDouble; j += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    // round6'd pairwise cosine — zero-norm vectors contribute 0 (a
    // zero embedding is "similar to nothing", it must not NaN-poison
    // the argmax; candidate stages already exclude them upstream)
    def cos(a: Int, b: Int): Double = {
      val va = vecs(a)
      val vb = vecs(b)
      val m = math.min(va.length, vb.length)
      var s = 0.0
      var j = 0
      while (j < m) { s += va(j).toDouble * vb(j).toDouble; j += 1 }
      val d = norms(a) * norms(b)
      if (d == 0.0) 0.0 else round6(s / d)
    }
    val oneMinusLambda = 1 - lambda
    val taken = new Array[Boolean](n)
    // max round6'd cosine from each candidate to the selected set
    val maxSim = new Array[Double](n)
    java.util.Arrays.fill(maxSim, Double.NegativeInfinity)
    val out = new Array[Any](take)
    var t = 0
    while (t < take) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val score =
            if (t == 0) round6(lambda * rels(i))
            else round6(lambda * rels(i) - oneMinusLambda * maxSim(i))
          if (
            best < 0 || score > bestScore ||
            (score == bestScore && ids(i) < ids(best))
          ) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      out(t) = new GenericInternalRow(
        Array[Any](ids(best), rels(best), bestScore, t + 1)
      )
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val sm = cos(i, best)
          if (sm > maxSim(i)) maxSim(i) = sm
        }
        i += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression over [[MmrKernel]]. */
object mmrExpressions {

  private val kernel = "graft.functions.MmrKernel"

  /** `mmr_select(cands)` → array of struct (neighbor_id, rel,
    * mmr_score, rank); `cands` must be array<struct<long, double,
    * array<float>>> (id, round6'd relevance, embedding).
    */
  case class MmrSelect(child: Expression, k: Int, lambda: Double)
      extends UnaryExpression {

    require(k > 0, s"k must be positive, got $k")
    require(lambda > 0 && lambda <= 1, s"lambda must be in (0,1], got $lambda")

    override def prettyName: String = "mmr_select"

    override def dataType: DataType = ArrayType(
      StructType(
        Seq(
          StructField("neighbor_id", LongType, nullable = false),
          StructField("rel", DoubleType, nullable = false),
          StructField("mmr_score", DoubleType, nullable = false),
          StructField("rank", IntegerType, nullable = false)
        )
      ),
      containsNull = false
    )

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 3 &&
            fields(0).dataType == LongType &&
            fields(1).dataType == DoubleType &&
            fields(2).dataType.isInstanceOf[ArrayType] &&
            fields(2).dataType
              .asInstanceOf[ArrayType]
              .elementType == FloatType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<long, double, array<float>>>, " +
            s"got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      MmrKernel.select(input.asInstanceOf[ArrayData], k, lambda)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        c => s"${ev.value} = $kernel.select($c, $k, ${lambda}D);"
      )

    override protected def withNewChildInternal(newChild: Expression): MmrSelect =
      copy(child = newChild)
  }

  def mmrSelect(cands: Column, k: Int, lambda: Double): Column =
    GraftColumnBridge.column(
      MmrSelect(GraftColumnBridge.expression(cands), k, lambda)
    )
}
