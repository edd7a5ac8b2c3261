package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Candidate pairs of ONE prefix-anchor cluster, pruned in place by the
  * PPJoin length and POSITIONAL filters (Xiao et al., WWW'08).
  *
  * Input `docs`: array<struct<id:long, sz:int, pos:int>> — the docs whose
  * PPJoin prefix contains this cluster's anchor shingle, each with its
  * full (fingerprinted, deduplicated) set size and the anchor's 0-based
  * position in the doc's globally-(df, h, h2)-sorted shingle list.
  * Emits (id_a, id_b) with id_a < id_b for pairs surviving BOTH filters:
  *
  *  - length: the best possible Jaccard of sizes (sa, sb) is
  *    min(sa,sb)/max(sa,sb);
  *  - positional: when this anchor is the pair's FIRST shared element in
  *    the global order, the overlap is at most 1 + min(sa-posA-1,
  *    sb-posB-1) — nothing before the first shared element is shared.
  *
  * Both bounds are compared in JACCARD space with the exact double
  * arithmetic the verifier uses (j = o/(sa+sb-o); correctly-rounded
  * division is monotone over the reals, so bound_real >= true_real
  * implies fl(bound) >= fl(true) and a pair the verifier would keep is
  * never pruned). The positional bound is only valid at the pair's
  * minimum shared anchor — at a later shared anchor earlier shared
  * elements DO exist — but pruning a non-minimum occurrence is harmless
  * (the minimum occurrence survives and downstream canonicalization
  * takes the min over survivors), and pruning the minimum occurrence is
  * a proof the pair's true Jaccard is below threshold. This filter is
  * what keeps a replica-flooded corpus affordable: two docs sharing a
  * common skeleton but each carrying many rarer unique shingles meet
  * only at deep positions, where the suffix bound collapses — measured
  * at the r10 sf100 probe, it is the difference between 124M candidate
  * pairs shipping fingerprint payloads and ~the true near-dup pairs
  * doing so.
  */
case class PrunedPairCombos(docs: Expression, threshold: Double)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(docs)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true

  override def dataType: DataType = ArrayType(new StructType()
    .add("id_a", LongType).add("id_b", LongType), containsNull = false)

  override def eval(input: InternalRow): Any = {
    val arr = docs.eval(input).asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Int](n)
    val pos = new Array[Int](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0); szs(i) = row.getInt(1); pos(i) = row.getInt(2)
      i += 1
    }
    val out = ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      val sa = szs(i); val pa = pos(i)
      var j = i + 1
      while (j < n) {
        val sb = szs(j); val pb = pos(j)
        val minSz = if (sa < sb) sa else sb
        val maxSz = if (sa < sb) sb else sa
        if (minSz.toDouble / maxSz >= threshold) {
          val suffix = math.min(sa - pa, sb - pb) // 1 + min(remaining-1)
          val ub = if (suffix > minSz) minSz else suffix
          if (ub.toDouble / (sa + sb - ub) >= threshold) {
            val a = ids(i); val b = ids(j)
            out += (if (a < b) InternalRow(a, b) else InternalRow(b, a))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PrunedPairCombos =
    copy(docs = newChildren(0))
}

/** Exact-Jaccard verification of one cluster's canonical pairs against its
  * members' 128-bit-fingerprinted shingle sets.
  *
  * `pairs`: array<struct<id_a:long, id_b:long>> (this cluster's — possibly
  * one CHUNK of a large cluster's — canonical candidates). `docs`:
  * array<struct<id:long, sz:int, fpl:array<long>>> where fpl is the
  * INTERLEAVED fingerprint sequence (h0, h2_0, h1, h2_1, …) in ascending
  * (h, h2) order — flat long arrays pack at 16 B/gram in Tungsten where
  * an array<struct<h,h2>> pays ~32 B/gram, and this payload IS the
  * verify stage's dominant shuffle (measured ~38 GB at the sf100
  * probe before packing). Every id referenced by `pairs` must appear.
  * Emits struct<id_a, id_b, jaccard> for pairs with jaccard >=
  * threshold, where jaccard is computed by a linear 2-step
  * merge-intersect over the sorted interleaved arrays:
  * |A∩B| / (|A| + |B| - |A∩B|).
  *
  * 128-bit fingerprints stand in for the shingle strings (the whole point:
  * a doc's verify payload is ~16 B per shingle instead of a ~30-char
  * string, shipped once per cluster instead of once per pair). A cross-set
  * collision — two DIFFERENT shingles with equal (h, h2) counted as shared
  * — needs a 2^-128 event somewhere among the corpus' pair comparisons:
  * ~1e-23 at 124M pairs × ~90 shingles, the same odds-class setCollapse
  * already relies on for exactness.
  */
case class VerifyPairs(pairs: Expression, docs: Expression, threshold: Double)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(pairs, docs)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true

  override def dataType: DataType = ArrayType(new StructType()
    .add("id_a", LongType).add("id_b", LongType).add("jaccard", DoubleType),
    containsNull = false)

  override def eval(input: InternalRow): Any = {
    val ds = docs.eval(input).asInstanceOf[ArrayData]
    val n = ds.numElements()
    val byId = new java.util.HashMap[java.lang.Long, (Int, Array[Long])](n * 2)
    var i = 0
    while (i < n) {
      val row = ds.getStruct(i, 3)
      byId.put(row.getLong(0), (row.getInt(1), row.getArray(2).toLongArray()))
      i += 1
    }
    val ps = pairs.eval(input).asInstanceOf[ArrayData]
    val np = ps.numElements()
    val out = ArrayBuffer.empty[Any]
    i = 0
    while (i < np) {
      val p = ps.getStruct(i, 2)
      val a = byId.get(p.getLong(0)); val b = byId.get(p.getLong(1))
      val inter = intersectSorted(a._2, b._2)
      val j = inter.toDouble / (a._1 + b._1 - inter)
      if (j >= threshold) out += InternalRow(p.getLong(0), p.getLong(1), j)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Merge-intersect two interleaved (h, h2) sequences sorted ascending
    * by (h, h2); indices advance in steps of 2. */
  private def intersectSorted(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var shared = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j)) match {
        case 0 => java.lang.Long.compare(a(i + 1), b(j + 1))
        case x => x
      }
      if (c == 0) { shared += 1; i += 2; j += 2 }
      else if (c < 0) i += 2
      else j += 2
    }
    shared
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VerifyPairs =
    copy(pairs = newChildren(0), docs = newChildren(1))
}

/** Exact Jaccard of two packed fingerprint sets — the DIRECT-verify
  * scalar for small candidate volumes. Inputs are the same interleaved
  * (h0, h2_0, h1, h2_1, …) ascending-(h, h2) `array<long>` payloads
  * [[VerifyPairs]] consumes; output is |A∩B| / (|A| + |B| - |A∩B|) with
  * the identical merge-intersect and double arithmetic, so the adaptive
  * cutover in `TextDedup.verifiedJaccardPairs` emits bit-identical
  * scores on either branch. One scalar eval per candidate pair: this is
  * the pair-priced shape (each doc's array ships once per pair it is
  * in), which is exactly right BELOW the cutover where pairs are few
  * and the cluster path's fixed ~5 extra shuffles dominate.
  */
case class PackedJaccard(a: Expression, b: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val xa = a.eval(input).asInstanceOf[ArrayData].toLongArray()
    val xb = b.eval(input).asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var shared = 0
    while (i < xa.length && j < xb.length) {
      val c = java.lang.Long.compare(xa(i), xb(j)) match {
        case 0 => java.lang.Long.compare(xa(i + 1), xb(j + 1))
        case x => x
      }
      if (c == 0) { shared += 1; i += 2; j += 2 }
      else if (c < 0) i += 2
      else j += 2
    }
    val denom = xa.length / 2 + xb.length / 2 - shared
    // Two empty packed sets would give 0/0 = NaN, which Spark orders
    // ABOVE all doubles — `jaccard >= threshold` would pass and emit a
    // bogus pair. Candidates always share an anchor shingle today, but
    // the expression must not depend on that caller invariant.
    if (denom == 0) 0.0 else shared.toDouble / denom
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PackedJaccard =
    copy(a = newChildren(0), b = newChildren(1))
}
