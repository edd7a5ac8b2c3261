package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (score, payload) pairs per group as a custom
  * `TypedImperativeAggregate` — the aggregate-function tier of the
  * extension ladder.
  *
  * Why not `row_number() OVER (PARTITION BY ...)`: a window sorts and
  * shuffles EVERY row of the group. This aggregate keeps a bounded k-size
  * min-heap per group on the map side (ObjectHashAggregate partial mode),
  * so only k rows per group per partition cross the shuffle — at 100 TB
  * the difference between shuffling the table and shuffling k×|groups|.
  *
  * Input: (score double, payload long); output: array<struct<score,payload>>
  * sorted descending by (score, payload) — deterministic under ties.
  */
case class TopKAgg(
    scoreExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"TopKAgg requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  /** Heap priority: head (the max per this ordering) is the WORST retained
    * pair — lowest score, and among score ties the LARGEST payload (rank
    * order is payload ascending, so larger payload = lower rank). Payload
    * must use the natural ordering here; reversing it would retain the
    * wrong side of a tie crossing the k boundary.
    */
  private def ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null) {
      val pair = (s.asInstanceOf[Double], p.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { pair =>
      if (a.size < k) a.enqueue(pair)
      else if (ord.lt(pair, a.head)) { a.dequeue(); a.enqueue(pair) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map { case (s, p) =>
      InternalRow(s, p)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.enqueue((bb.getDouble, bb.getLong)))
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), payloadExpr = newChildren(1))
}
