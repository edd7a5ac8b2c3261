package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for the dedup family (SURVEY.md §2.3).
  *
  * Why native: the same sketches composed from higher-order functions
  * (`transform`/`aggregate`) re-evaluate captured sub-expressions per array
  * element in the interpreted lambda path — measured ~33 ms/doc for a
  * 32-hash minhash at 100 tokens, i.e. O(tokens² × hashes). These
  * expressions do one tight loop per row: O(shingles × hashes) with
  * zero-allocation xxhash64 over UTF8String bytes. CodegenFallback is fine —
  * per-row cost is the hashing loop, not the dispatch.
  */

/** Word or char n-gram shingles (distinct, order-preserved) of a
  * pre-normalized text (single-space separated; compose with `normText`).
  * Shorter-than-n inputs yield one shingle (the whole text).
  */
case class Shingles(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new mutable.LinkedHashSet[UTF8String]
    if (word) {
      val toks = s.split(' ')
      if (toks.length <= n) out += UTF8String.fromString(s)
      else {
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          out += UTF8String.fromString(sb.toString)
          i += 1
        }
      }
    } else {
      if (s.length <= n) out += UTF8String.fromString(s)
      else {
        var i = 0
        while (i <= s.length - n) { out += UTF8String.fromString(s.substring(i, i + n)); i += 1 }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

private[functions] object SketchHash {
  /** xxhash64 of a UTF8String under `seed` (Spark's XXH64, zero-copy). */
  @inline def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** MinHash signature: element i is min over shingles of xxhash64(shingle,
  * seed=i). Input: array<string> shingles; output: array<long> length
  * `numHashes`. Empty input → empty-seeded signature (hash of nothing =
  * Long.MaxValue sentinel per position).
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < numHashes) {
        val h = SketchHash.hash(s, j.toLong)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (Charikar): bit j set when the ±1 sum of
  * token-hash bit j over all tokens is positive. Input: array<string>.
  */
case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = SketchHash.hash(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
