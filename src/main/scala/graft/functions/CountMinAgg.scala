package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a mergeable `TypedImperativeAggregate` (Cormode &
  * Muthukrishnan): approximate frequencies for EVERY item — not just the
  * top-k the SpaceSaving sketch retains — in one pass with a fixed
  * `depth × width` counter grid per partition, merged by elementwise sum
  * (exactly associative/commutative, so the result is bit-identical
  * under any partitioning). Estimates are one-sided: the min over the
  * item's `depth` counters ≥ the true count, overshooting by at most
  * ~2N/width with probability 1 − (1/2)^depth.
  *
  * vs `groupBy(item).count`: the exact plan shuffles one row per DISTINCT
  * item; this shuffles depth×width longs per partition regardless of
  * cardinality. At 100 TB of open-vocabulary tokens the sketch is the
  * only per-item-frequency plan whose shuffle does not grow with the
  * vocabulary — and unlike SpaceSaving it can answer point queries for
  * items outside the heavy tail.
  *
  * Hash family: row i uses Spark's own XXH64 with chained seed
  * `hashLong(i, 42)` — byte-identical to the BUILT-IN Column expression
  * `xxhash64(lit(i).cast("long"), item)`, so [[CountMinAgg.estimate]]
  * reads the published sketch with pure Catalyst array ops (codegen'd,
  * distributed, no UDF) and agrees with the imperative update exactly.
  *
  * Output: struct(total, counters array<long> of depth*width, row-major).
  */
case class CountMinAgg(
    itemExpr: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinAgg.Sketch] {

  require(depth > 0 && depth <= 16, s"depth must be in 1..16, got $depth")
  require(width > 0, s"width must be > 0, got $width")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("counters", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): CountMinAgg.Sketch =
    new CountMinAgg.Sketch(depth, width)

  override def update(buf: CountMinAgg.Sketch, input: InternalRow): CountMinAgg.Sketch = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: CountMinAgg.Sketch, b: CountMinAgg.Sketch): CountMinAgg.Sketch =
    a.mergeIn(b)

  override def eval(buf: CountMinAgg.Sketch): Any =
    InternalRow(buf.total, new GenericArrayData(buf.counters))

  override def serialize(buf: CountMinAgg.Sketch): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.counters.length)
    bb.putLong(buf.total)
    buf.counters.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountMinAgg.Sketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new CountMinAgg.Sketch(depth, width)
    s.total = bb.getLong
    var i = 0
    while (i < s.counters.length) { s.counters(i) = bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(itemExpr = newChildren(0))
}

object CountMinAgg {

  /** Seed chain of the builtin `xxhash64(lit(i).cast("long"), item)`. */
  private[functions] def bucket(item: UTF8String, row: Int, width: Int): Int =
    Math.floorMod(XXH64.hashUTF8String(item, XXH64.hashLong(row.toLong, 42L)),
      width.toLong).toInt

  /** Row-major depth×width counter grid. */
  final class Sketch(val depth: Int, val width: Int) {
    val counters: Array[Long] = new Array[Long](depth * width)
    var total: Long = 0L

    def add(item: UTF8String): Unit = {
      var r = 0
      while (r < depth) {
        counters(r * width + bucket(item, r, width)) += 1L
        r += 1
      }
      total += 1L
    }

    def mergeIn(other: Sketch): Sketch = {
      var i = 0
      while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
      total += other.total
      this
    }
  }

  import org.apache.spark.sql.{Column, GraftBridge}
  import org.apache.spark.sql.functions._

  /** Point-estimate an item's count from a published sketch struct —
    * pure Catalyst (codegen'd): min over the item's `depth` counters,
    * each located with the SAME builtin xxhash64 the aggregate used.
    */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    array_min(transform(sequence(lit(0), lit(depth - 1)), r =>
      element_at(sketch.getField("counters"),
        (pmod(xxhash64(r.cast("long"), item), lit(width.toLong)) +
          r.cast("long") * width + 1L).cast("int"))))
}
