package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise MIN over fixed-width `array<long>` rows — the signature
  * aggregation primitive of MinHash-style sketches: given one hash vector
  * per (doc, item) row, produces the per-doc signature in ONE aggregation.
  *
  * Why not `posexplode` + `min() GROUP BY (doc, pos)` + `collect_list`:
  * that shape materializes width× the rows, shuffles (doc, pos) keys, and
  * needs a SECOND shuffle to reassemble the ordered array. This aggregate
  * keeps a fixed width-long buffer per group on the map side
  * (ObjectHashAggregate partial mode), so exactly one width-length array
  * per group per partition crosses the shuffle and the output is already
  * position-ordered — at 100 TB the difference between shuffling
  * width×corpus rows twice and |groups| compact vectors once.
  *
  * Input rows shorter/longer than `width` are rejected (data bug);
  * null arrays are ignored like SQL aggregates ignore nulls.
  */
case class VecMinAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0, s"VecMinAgg requires width > 0, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Empty array = "no input seen yet" sentinel (distinguishable because
    * width > 0).
    */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      require(arr.length == width,
        s"VecMinAgg(width=$width) got array of length ${arr.length}")
      if (buf.isEmpty) arr.clone()
      else {
        var i = 0
        while (i < width) {
          if (arr(i) < buf(i)) buf(i) = arr(i)
          i += 1
        }
        buf
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < width) {
        if (b(i) < a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

  /** Groups always see ≥1 row in practice; an all-null group yields the
    * MaxValue vector rather than throwing.
    */
  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(if (buf.isEmpty) Array.fill(width)(Long.MaxValue) else buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMinAgg =
    copy(child = newChildren(0))
}
