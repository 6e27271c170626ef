package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Grouped top-k as a REAL aggregate instead of a window rank.
  *
  * `topKBy(metric, id, k)` keeps the k largest (metric, id) entries
  * per group in a bounded heap. Because it is a
  * [[TypedImperativeAggregate]], Spark runs it with partial
  * aggregation: every map task reduces its slice of a group to <= k
  * entries BEFORE the exchange, so the shuffle carries
  * O(partitions * k) rows per group — a window `row_number() <= k`
  * must instead shuffle and SORT every row of every group. At 100 TB
  * ("top 5 documents per domain by quality score" over billions of
  * rows) that is the difference between a bounded merge and a full
  * corpus sort.
  *
  * Determinism: entries order by (metric DESC, id ASC) using total
  * double ordering (`java.lang.Double.compare`; NaN sorts above all
  * finite values). The boundary between kept and dropped entries is a
  * total order, so the result set is independent of partitioning.
  * Rows with a NULL metric or id are skipped.
  *
  * Result: `array<struct<metric double, id bigint>>`, strongest first.
  */
case class TopKByAgg(
    metric: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "topk_by"

  override def children: Seq[Expression] = Seq(metric, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else
      (metric.dataType, id.dataType) match {
        case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (m, i) =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires (double, bigint), got (${m.catalogString}, ${i.catalogString})"
          )
      }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("metric", DoubleType, nullable = false), StructField("id", LongType, nullable = false))
    ),
    containsNull = false
  )

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val m = metric.eval(input)
    val i = id.eval(input)
    if (m != null && i != null)
      buffer.add(m.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedDesc()
    new GenericArrayData(sorted.map { case (m, i) =>
      new GenericInternalRow(Array[Any](m, i)): Any
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialized()

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): TopKByAgg = copy(metric = newChildren(0), id = newChildren(1))
}

/** Bounded top-k heap over (metric, id) pairs.
  *
  * Implemented as a plain binary min-heap on parallel primitive
  * arrays (no boxing, no per-entry allocation): the ROOT is the
  * weakest kept entry, so admission is one compare against the root
  * and replacement is a sift-down — O(log k) per row, O(k) memory.
  * "Weaker" = (smaller metric) or (equal metric, larger id), a total
  * order via java.lang.Double.compare.
  */
final class TopKBuffer(val k: Int) {
  private val ms = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** a-entry strictly weaker than b-entry? */
  private def weaker(ma: Double, ia: Long, mb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(ma, mb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var weakest = i
      if (l < n && weaker(ms(l), ids(l), ms(weakest), ids(weakest))) weakest = l
      if (r < n && weaker(ms(r), ids(r), ms(weakest), ids(weakest))) weakest = r
      if (weakest == i) return
      val tm = ms(i); val ti = ids(i)
      ms(i) = ms(weakest); ids(i) = ids(weakest)
      ms(weakest) = tm; ids(weakest) = ti
      i = weakest
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (weaker(ms(i), ids(i), ms(p), ids(p))) {
        val tm = ms(i); val ti = ids(i)
        ms(i) = ms(p); ids(i) = ids(p)
        ms(p) = tm; ids(p) = ti
        i = p
      } else return
    }
  }

  def add(m: Double, id: Long): Unit =
    if (n < k) {
      ms(n) = m; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (weaker(ms(0), ids(0), m, id)) {
      ms(0) = m; ids(0) = id
      siftDown(0)
    }

  def addAll(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.ms(i), other.ids(i)); i += 1 }
  }

  /** Kept entries, strongest first. */
  def sortedDesc(): Array[(Double, Long)] =
    (0 until n)
      .map(i => (ms(i), ids(i)))
      .sortWith { case ((ma, ia), (mb, ib)) => weaker(mb, ib, ma, ia) }
      .toArray

  def serialized(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(ms(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val m = bb.getDouble; val id = bb.getLong
      buf.add(m, id)
      i += 1
    }
    buf
  }
}

object topkAggregate {

  /** Column API for [[TopKByAgg]]: top `k` ids per group by `metric`,
    * as `array<struct<metric double, id bigint>>`, strongest first.
    */
  def topKBy(metric: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByAgg(
        GraftColumnBridge.expression(metric),
        GraftColumnBridge.expression(id),
        k
      ).toAggregateExpression()
    )
}
