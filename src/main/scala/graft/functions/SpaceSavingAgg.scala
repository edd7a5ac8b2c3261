package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a mergeable
  * `TypedImperativeAggregate` — approximate top frequent items in ONE
  * pass with a bounded `capacity`-counter summary per partition, merged
  * associatively (Agarwal et al., "Mergeable Summaries"; Metwally et al.,
  * SpaceSaving). The exact alternative (`groupBy(item).count` then
  * top-k) shuffles one row per DISTINCT item; this shuffles `capacity`
  * counters per partition regardless of cardinality — at 100 TB of
  * high-cardinality tokens that is the difference between a
  * vocabulary-sized shuffle and a constant one.
  *
  * Soundness invariants (spec-checked):
  *  - count_lo ≤ true count ≤ count_hi for every reported item
  *    (count_lo = count_hi − err);
  *  - any item with true count > floor (the max evicted/absorbed
  *    count_hi) is IN the summary — so true heavy hitters can't be
  *    missed;
  *  - with ≤ `capacity` distinct items and no merges past capacity the
  *    sketch is exact (err = 0, count_hi = true count).
  *
  * Buffer: item → (count_hi, err), plus the buffer-wide eviction floor.
  * Merge: union counts (absent side contributes its floor to both hi and
  * err — conservative but sound), retain top `capacity` by count_hi,
  * fold evicted entries into the new floor.
  */
case class SpaceSavingAgg(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingAgg.Summary] {

  require(capacity > 0, s"SpaceSavingAgg requires capacity > 0, got $capacity")

  import SpaceSavingAgg.Summary

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_hi", LongType, nullable = false),
      StructField("count_lo", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Summary = new Summary

  override def update(buf: Summary, input: InternalRow): Summary = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(a: Summary, b: Summary): Summary = a.mergeIn(b, capacity)

  /** Entries sorted by (count_hi desc, item asc) — deterministic given the
    * same summary state.
    */
  override def eval(buf: Summary): Any = {
    val sorted = buf.counts.toArray.sortBy { case (item, (hi, _)) => (-hi, item) }
    new GenericArrayData(sorted.map { case (item, (hi, err)) =>
      InternalRow(UTF8String.fromString(item), hi, hi - err)
    }.toArray[Any])
  }

  override def serialize(buf: Summary): Array[Byte] = {
    val items = buf.counts.toArray
    val itemBytes = items.map { case (s, _) => s.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      8 + 4 + itemBytes.map(_.length + 4 + 16).sum)
    bb.putLong(buf.floor)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(itemBytes(i).length)
      bb.put(itemBytes(i))
      bb.putLong(items(i)._2._1)
      bb.putLong(items(i)._2._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new Summary
    s.floor = bb.getLong
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      s.counts.put(new String(arr, "UTF-8"), (bb.getLong, bb.getLong))
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(itemExpr = newChildren(0))
}

object SpaceSavingAgg {

  /** Mutable SpaceSaving summary: counts = item → (count_hi, err);
    * floor = the largest count_hi ever evicted or absorbed (0 until the
    * summary overflows). Any unseen item's true count is ≤ floor.
    */
  final class Summary {
    val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
    var floor: Long = 0L

    // Lazy min-heap over (count_hi, item) for O(log capacity) eviction.
    // A full summary sees one eviction per UNTRACKED arrival — at corpus
    // scale that is nearly every row (10M shingle arrivals against a 65k
    // summary at sf1), so the original O(capacity) minBy scan was
    // quadratic-grade: 295 s for d_dedup_ngram_sketch at sf1, 11.6 s
    // with the heap. Entries go stale when an item's count moves on
    // (or the item is evicted); dequeue skips any entry that no longer
    // matches the live count, and the heap is rebuilt from `counts` when
    // stale entries pile past ~4× capacity (amortized O(log capacity)
    // per add). The heap is DERIVED state: never serialized, dropped on
    // merge/deserialize, and not built at all until the first eviction —
    // below capacity the sketch costs exactly what it did before.
    private var heap: mutable.PriorityQueue[(Long, String)] = null
    private def heapOrd: Ordering[(Long, String)] =
      Ordering.Tuple2(Ordering.Long, Ordering.String).reverse
    private def rebuildHeap(): Unit = {
      heap = mutable.PriorityQueue.empty(heapOrd)
      counts.foreach { case (i, (hi, _)) => heap.enqueue((hi, i)) }
    }
    private[SpaceSavingAgg] def dropHeap(): Unit = heap = null
    private def push(hi: Long, item: String, capacity: Int): Unit =
      if (heap != null) {
        heap.enqueue((hi, item))
        if (heap.size > 4 * capacity + 64) rebuildHeap()
      }

    def add(item: String, capacity: Int): Unit = counts.get(item) match {
      case Some((hi, err)) =>
        counts.update(item, (hi + 1, err))
        push(hi + 1, item, capacity)
      case None if counts.size < capacity =>
        counts.update(item, (floor + 1, floor))
        push(floor + 1, item, capacity)
      case None =>
        // Evict the min-count entry — same (count_hi, item) order the
        // minBy used, so eviction ties stay deterministic; the newcomer
        // inherits the evicted count as error (classic SpaceSaving
        // replacement).
        if (heap == null) rebuildHeap()
        var minHi = 0L; var minItem: String = null
        while (minItem == null) {
          val (hi, i) = heap.dequeue()
          if (counts.get(i).exists(_._1 == hi)) { minHi = hi; minItem = i }
        }
        counts.remove(minItem)
        if (minHi > floor) floor = minHi
        counts.update(item, (minHi + 1, minHi))
        push(minHi + 1, item, capacity)
    }

    /** Sound merge: for the union of items, each side contributes its
      * count (or its floor, for items it never tracked — both to hi and
      * to err). Then retain top-capacity by (hi, item) and fold the rest
      * into the floor.
      */
    def mergeIn(other: Summary, capacity: Int): Summary = {
      val all = counts.keySet ++ other.counts.keySet
      val merged = all.iterator.map { item =>
        val (ah, ae) = counts.getOrElse(item, (floor, floor))
        val (bh, be) = other.counts.getOrElse(item, (other.floor, other.floor))
        item -> (ah + bh, ae + be)
      }.toArray
      var newFloor = floor + other.floor
      val (keep, evict) =
        if (merged.length <= capacity) (merged, Array.empty[(String, (Long, Long))])
        else {
          val sorted = merged.sortBy { case (item, (hi, _)) => (-hi, item) }
          (sorted.take(capacity), sorted.drop(capacity))
        }
      evict.foreach { case (_, (hi, _)) => if (hi > newFloor) newFloor = hi }
      counts.clear()
      keep.foreach { case (item, c) => counts.put(item, c) }
      floor = newFloor
      dropHeap() // derived state — stale after a bulk rewrite
      this
    }
  }
}
