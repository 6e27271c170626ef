package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for signature computation.
  *
  * Higher-order functions (`transform`/`aggregate`) evaluate their
  * lambda per element through the interpreted expression walker —
  * measured ~0.6 ms/row for a 16-seed MinHash over ~50 shingles.
  * These expressions call one tight JVM loop per row (~1 us/row — see
  * [[HashKernels]]), the preferred shape for scan-side signatures over
  * 100 TB of documents, and implement `doGenCode` so surrounding
  * whole-stage codegen stays fused (the generated Java calls the same
  * static kernel the interpreted path uses — parity by construction).
  */
object hashExpressions {

  private val kernels = "graft.functions.HashKernels"

  /** `tokenHashes(text)`: one XXH64 per whitespace token, hashed
    * directly over the UTF-8 bytes — no token strings are ever
    * materialized. Split semantics match `split(text, " ")` with
    * unlimited limit (empty tokens between/after separators are kept).
    */
  case class TokenHashes(child: Expression) extends UnaryExpression {

    override def prettyName: String = "token_hashes"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.tokenHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.tokenHashes($c);")

    override protected def withNewChildInternal(newChild: Expression): TokenHashes =
      copy(child = newChild)
  }

  /** `shingleHashes(tokenHashes, n)`: hash of each window of n
    * consecutive token hashes (chained XXH64 fold); empty array when
    * fewer than n tokens. Requires non-null elements (a shingle is a
    * window of CONSECUTIVE hashes — the kernel reads raw longs, so a
    * null slot would silently hash as 0). To narrow a nullable-element
    * input use `array_compact(a)` — its result type IS
    * containsNull=false; note `filter(a, x -> x IS NOT NULL)` does NOT
    * narrow the type and still fails this check.
    */
  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0)

    override def prettyName: String = "shingle_hashes"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> with non-null elements; " +
            "use array_compact(...) upstream — it narrows the element " +
            "type to non-null (filter(a, x -> x IS NOT NULL) does not)"
        )
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.shingleHashes(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.shingleHashes($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** `minhashSignature(shingleHashes, n)`: for seed s in [0, n), the
    * min over the input array of XXH64(elem, seed=s). One pass over the
    * array, n running minima. Nullable-element inputs are accepted —
    * the kernel SKIPS null slots (a null shingle contributes no
    * minimum), unlike [[ShingleHashes]] where a null would corrupt
    * neighboring windows. Empty/all-null input yields Long.MaxValue
    * slots (callers filter empty shingle sets upstream).
    */
  case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
    require(numHashes > 0)

    override def prettyName: String = "minhash_signature"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.minhashSignature(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.minhashSignature($c, $numHashes);")

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** `simhash64(tokenHashes)`: bit j of the result is set iff more
    * input elements have bit j set than unset (ties -> 0), i.e. the
    * sign of the per-bit +1/-1 vote. One pass, 64 counters.
    * Nullable-element inputs are accepted — the kernel SKIPS null
    * slots (a null token casts no vote).
    */
  case class SimHash64(child: Expression) extends UnaryExpression {

    override def prettyName: String = "simhash64"
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.simhash64(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernels.simhash64($c);")

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** `dotProduct(a, b)`: left-to-right fold of sum(a[i]*b[i]) in
    * double — the SAME IEEE operation sequence as the HOF formulation
    * (`aggregate(sequence..., acc + a[i]*b[i])`), so results are
    * bitwise identical to the DuckDB oracle's list_sum/list_transform
    * mirror; just ~100x cheaper per element than the interpreted
    * lambda walk. Shorter array length bounds the fold (zip semantics).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def prettyName: String = "dot_product"
    override def dataType: DataType = DoubleType

    private def elemType(e: Expression) = e.dataType match {
      case ArrayType(t, _) => t
      case _               => NullType
    }

    private def elemNullable(e: Expression) = e.dataType match {
      case ArrayType(_, n) => n
      case _               => false
    }

    private def leftFloat = elemType(left) == FloatType
    private def rightFloat = elemType(right) == FloatType
    private def anyElemNullable = elemNullable(left) || elemNullable(right)

    // a null ELEMENT nullifies the result (HOF/DuckDB parity), so the
    // expression is nullable even over non-null array columns
    override def nullable: Boolean = super.nullable || anyElemNullable

    override def checkInputDataTypes(): TypeCheckResult =
      (elemType(left), elemType(right)) match {
        case (FloatType | DoubleType, FloatType | DoubleType) =>
          TypeCheckResult.TypeCheckSuccess
        case _ =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires two array<float|double> inputs"
          )
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      if (anyElemNullable)
        HashKernels.dotProductBoxed(
          a.asInstanceOf[ArrayData],
          b.asInstanceOf[ArrayData],
          leftFloat,
          rightFloat
        )
      else
        HashKernels.dotProduct(
          a.asInstanceOf[ArrayData],
          b.asInstanceOf[ArrayData],
          leftFloat,
          rightFloat
        )

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      if (!anyElemNullable)
        nullSafeCodeGen(
          ctx,
          ev,
          (a, b) => s"${ev.value} = $kernels.dotProduct($a, $b, $leftFloat, $rightFloat);"
        )
      else
        nullSafeCodeGen(
          ctx,
          ev,
          (a, b) => {
            val tmp = ctx.freshName("dotBoxed")
            s"""
            java.lang.Double $tmp = $kernels.dotProductBoxed($a, $b, $leftFloat, $rightFloat);
            ${ev.isNull} = ($tmp == null);
            if (!${ev.isNull}) { ${ev.value} = $tmp.doubleValue(); }
            """
          }
        )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): DotProduct = copy(left = newLeft, right = newRight)
  }

  /** `nearestCells(vec)`: ids of the `take` nearest centroids by
    * squared L2 — the IVF coarse-quantizer assignment
    * ([[graft.similarity.Similarity.ivfTopK]]). The centroid matrix is
    * a PLAN-TIME constant (fit on a bounded sample before the query is
    * built) carried as an expression field: interpreted eval reads it
    * directly, generated code binds it once via `addReferenceObj` —
    * never serialized per row. This replaced a per-row Scala UDF whose
    * `.asNondeterministic()` marker existed only to stop the optimizer
    * double-evaluating it; a native expression keeps whole-stage
    * codegen fused and needs no such workaround (a pushed-down
    * isnotnull on the join key may still re-evaluate the kernel in a
    * scan filter, but at nlist*dim flops in tight JVM code that is
    * noise, where the boxed UDF round-trip was not).
    *
    * Returns null for vectors shorter than the centroid dim or with a
    * null slot among the first dim elements (no meaningful cell).
    */
  case class NearestCells(
      child: Expression,
      centroids: Array[Array[Double]],
      take: Int
  ) extends UnaryExpression {
    require(centroids.nonEmpty && take > 0, "nearestCells needs centroids and take > 0")

    private val dim = centroids.head.length
    // row-major flat matrix: one reference object in generated code
    private lazy val flat: Array[Double] = {
      val f = new Array[Double](centroids.length * dim)
      var j = 0
      while (j < centroids.length) {
        System.arraycopy(centroids(j), 0, f, j * dim, dim)
        j += 1
      }
      f
    }

    override def prettyName: String = "nearest_cells"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    // null for ragged/null-slot vectors even when the input is non-null
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.nearestCells(input.asInstanceOf[ArrayData], flat, dim, take)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("ivfCentroids", flat, "double[]")
      nullSafeCodeGen(
        ctx,
        ev,
        c => {
          val tmp = ctx.freshName("cells")
          s"""
          org.apache.spark.sql.catalyst.util.ArrayData $tmp =
            $kernels.nearestCells($c, $centsRef, $dim, $take);
          ${ev.isNull} = ($tmp == null);
          if (!${ev.isNull}) { ${ev.value} = $tmp; }
          """
        }
      )
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCells =
      copy(child = newChild)
  }

  /** Identity wrapper that pins an expensive projected expression in
    * place: evaluation is the child's, bit for bit, but the expression
    * reports non-deterministic.
    *
    * A filter on a projected column is rewritten through the Project by
    * PushDownPredicates with the alias substituted, so a cheap-looking
    * `.where(col("_cn") > 0)` over `_cn = norm(quantize(vec))` ends up
    * re-evaluating the whole O(dim) pipeline once in the pushed Filter
    * and again in the Project above it (measured 2.4x on the quantized
    * ANN scan). Wrap the projected FIELD (`noPushdown(norm(...))`), not
    * the predicate: PushPredicateThroughNonJoin only checks determinism
    * of the project list, so a non-deterministic-flagged predicate is
    * still rewritten through a deterministic Project (and `rand() < 0`
    * guards are folded away outright). One flagged field keeps every
    * filter above that projection and stops CollapseProject duplicating
    * its producers; codegen forwards the child's code so whole-stage
    * fusion is preserved.
    */
  case class NoPushdown(child: Expression) extends UnaryExpression {
    override def prettyName: String = "no_pushdown"
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override lazy val deterministic: Boolean = false
    override def foldable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    }
    override protected def withNewChildInternal(newChild: Expression): NoPushdown =
      copy(child = newChild)
  }

  def noPushdown(c: Column): Column =
    GraftColumnBridge.column(NoPushdown(GraftColumnBridge.expression(c)))

  def tokenHashes(text: Column): Column =
    GraftColumnBridge.column(TokenHashes(GraftColumnBridge.expression(text)))

  def shingleHashes(tokenHashes: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(tokenHashes), n))

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b))
    )

  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(shingleHashes), numHashes)
    )

  def simhash64(tokenHashes: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokenHashes)))

  def nearestCells(vec: Column, centroids: Array[Array[Double]], take: Int): Column =
    GraftColumnBridge.column(
      NearestCells(GraftColumnBridge.expression(vec), centroids, take)
    )

  /** Shared shape of the PQ codebook-bound expressions: the codebook
    * tensor `books(m)(ksub)(subDim)` is a PLAN-TIME constant (fit on a
    * bounded driver sample, like [[NearestCells]]'s centroids),
    * flattened subspace-major and bound once into generated code via
    * `addReferenceObj` — never serialized per row.
    */
  private[functions] trait PqCodebooks {
    def books: Array[Array[Array[Double]]]
    require(
      books.nonEmpty && books.forall(_.length == books.head.length) &&
        books.head.nonEmpty && books.flatten.forall(_.length == books.head.head.length),
      "PQ codebooks must be a non-empty rectangular (m, ksub, subDim) tensor"
    )
    protected final val m: Int = books.length
    protected final val ksub: Int = books.head.length
    protected final val subDim: Int = books.head.head.length
    protected final lazy val flat: Array[Double] = {
      val f = new Array[Double](m * ksub * subDim)
      var mi = 0
      while (mi < m) {
        var kj = 0
        while (kj < ksub) {
          System.arraycopy(books(mi)(kj), 0, f, (mi * ksub + kj) * subDim, subDim)
          kj += 1
        }
        mi += 1
      }
      f
    }
  }

  /** `pqEncode(vec)`: the m nearest-sub-centroid codes of a vector —
    * the product-quantization compression step
    * ([[graft.similarity.Similarity.pqTopK]]). Null for ragged/
    * null-slot vectors, same contract as [[NearestCells]].
    */
  case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression
      with PqCodebooks {

    override def prettyName: String = "pq_encode"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.pqEncode(input.asInstanceOf[ArrayData], flat, m, ksub, subDim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
      nullSafeCodeGen(
        ctx,
        ev,
        c => {
          val tmp = ctx.freshName("codes")
          s"""
          org.apache.spark.sql.catalyst.util.ArrayData $tmp =
            $kernels.pqEncode($c, $booksRef, $m, $ksub, $subDim);
          ${ev.isNull} = ($tmp == null);
          if (!${ev.isNull}) { ${ev.value} = $tmp; }
          """
        }
      )
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** `pqAdcTable(vec)`: the asymmetric-distance table of a QUERY
    * vector — dot of each query subvector with every sub-centroid
    * (m·ksub doubles). Computed once per query row on the broadcast
    * side; candidate scoring then costs m array lookups
    * ([[PqAdcDot]]).
    */
  case class PqAdcTable(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression
      with PqCodebooks {

    override def prettyName: String = "pq_adc_table"
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.catalogString}"
        )
    }

    override protected def nullSafeEval(input: Any): Any =
      HashKernels.pqAdcTable(input.asInstanceOf[ArrayData], flat, m, ksub, subDim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
      nullSafeCodeGen(
        ctx,
        ev,
        c => {
          val tmp = ctx.freshName("adcTab")
          s"""
          org.apache.spark.sql.catalyst.util.ArrayData $tmp =
            $kernels.pqAdcTable($c, $booksRef, $m, $ksub, $subDim);
          ${ev.isNull} = ($tmp == null);
          if (!${ev.isNull}) { ${ev.value} = $tmp; }
          """
        }
      )
    }

    override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
      copy(child = newChild)
  }

  /** `pqAdcDot(codes, table)`: sum of the table entries the codes
    * select — dot(query, reconstruction(candidate)) in m adds. `ksub`
    * must be the codebook width both inputs were built with.
    */
  case class PqAdcDot(left: Expression, right: Expression, ksub: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    require(ksub > 0, "pqAdcDot needs ksub > 0")

    override def prettyName: String = "pq_adc_dot"
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, false), ArrayType(DoubleType, false)) =>
          TypeCheckResult.TypeCheckSuccess
        case (ArrayType(IntegerType, true), _) | (_, ArrayType(DoubleType, true)) =>
          // a nullable element would read as 0 through UnsafeArrayData
          // — i.e. silently score against sub-centroid 0 (same
          // rejection rationale as ShingleHashes)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires non-null array elements; use " +
              "array_compact(...) upstream — it narrows the element type"
          )
        case _ =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (array<int> codes, array<double> table)"
          )
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      HashKernels.pqAdcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        (a, b) => s"${ev.value} = $kernels.pqAdcDot($a, $b, $ksub);"
      )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): PqAdcDot = copy(left = newLeft, right = newRight)
  }

  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec), books))

  def pqAdcTable(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqAdcTable(GraftColumnBridge.expression(vec), books))

  def pqAdcDot(codes: Column, table: Column, ksub: Int): Column =
    GraftColumnBridge.column(
      PqAdcDot(
        GraftColumnBridge.expression(codes),
        GraftColumnBridge.expression(table),
        ksub
      )
    )
}
