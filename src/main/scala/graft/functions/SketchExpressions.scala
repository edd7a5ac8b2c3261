package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructType}
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

/** Word or char n-gram shingles (distinct, order-preserved) of RAW text.
  * Normalization (trim/strip-accents/lower/collapse-ws) happens inside via
  * SketchHash.tokenize — one char scan, not the interpreted regex chain.
  * Shorter-than-n inputs yield one shingle (the whole normalized text).
  */
case class Shingles(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = SketchHash.tokenize(input.asInstanceOf[UTF8String].toString)
    val out = new mutable.LinkedHashSet[UTF8String]
    if (word) {
      if (toks.length <= n) out += UTF8String.fromString(toks.mkString(" "))
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
      val s = toks.mkString(" ")
      // Windows advance by CODEPOINT, not UTF-16 unit: a window cutting
      // through a surrogate pair would UTF-8-encode its halves as '?',
      // collapsing distinct non-BMP n-grams into identical mangled ones.
      val bounds = {
        val buf = mutable.ArrayBuffer.empty[Int]
        var p = 0
        while (p < s.length) { buf += p; p += Character.charCount(s.codePointAt(p)) }
        buf += s.length
        buf.toArray
      }
      val m = bounds.length - 1 // codepoint count
      if (m <= n) out += UTF8String.fromString(s)
      else {
        var k = 0
        while (k <= m - n) {
          out += UTF8String.fromString(s.substring(bounds(k), bounds(k + n)))
          k += 1
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** ALL n-token windows of `child` in document order (NOT distinct —
  * positions matter: `posexplode` over this array yields (pos, gram)
  * with pos the 0-based token offset, the unit the exact-substring
  * dedup contract is stated in). Tokenization is a verbatim split on
  * single spaces (empty tokens preserved) so a DuckDB oracle replays it
  * as `string_split(text, ' ')` — deliberately NOT SketchHash.tokenize,
  * whose normalization the oracle cannot reproduce. Inputs shorter than
  * n tokens yield an EMPTY array (no window fits — the `range` guard on
  * the SQL side). Why native instead of `transform(sequence(...), i ->
  * array_join(slice(t, i+1, n), ' '))`: projection collapse inlines the
  * `split` into the lambda, re-tokenizing per element (the measured
  * O(tokens²) hazard documented on [[Shingles]]); here one split + one
  * StringBuilder pass per row.
  */
case class SubstrWindows(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SubstrWindows =
    copy(child = newChild)
}

/** All ordered pairs from a posting list: array<struct<id, sz>> (sorted,
  * so id_a < id_b holds positionally) → array<struct<id_a, id_b, sz_a,
  * sz_b>>. One tight O(n²/2) loop per list — the higher-order
  * `transform`+`slice` formulation pays an interpreted lambda dispatch
  * and an array slice copy per element instead (the shuffle dominates
  * this query at small SF, but per-element interpreted dispatch is the
  * kind of cost that grows with posting-list size at corpus scale). Id
  * type is taken from the input struct, so any orderable id works.
  */
case class PairCombos(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private lazy val idType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType](0).dataType

  override def dataType: DataType = ArrayType(new StructType()
    .add("id_a", idType).add("id_b", idType)
    .add("sz_a", IntegerType).add("sz_b", IntegerType), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > Int.MaxValue - 8)
      throw new IllegalArgumentException(
        s"posting list of $n entries would generate $nPairs pairs; " +
          "tighten the df-cut (maxDf) upstream")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val si = arr.getStruct(i, 2)
      val idA = si.get(0, idType)
      val szA = si.getInt(1)
      var j = i + 1
      while (j < n) {
        val sj = arr.getStruct(j, 2)
        out(k) = InternalRow(idA, sj.get(0, idType), szA, sj.getInt(1))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
}

/** Token ARRAY under SketchHash.tokenize (duplicates preserved, unlike
  * Shingles' distinct sets) — for consumers that must count or weight
  * tokens under exactly the sketch tokenizer (e.g. the BPE trainer, whose
  * applier tokenizes with SketchHash.tokenize inside the expression).
  */
case class Tokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SketchHash.tokenize(input.asInstanceOf[UTF8String].toString)
        .map(t => UTF8String.fromString(t): Any))

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

/** Token COUNT under SketchHash.tokenize — the same tokenizer Shingles and
  * SimHash use, so metrics that relate distinct shingles to total tokens
  * (repetition fractions) are internally consistent on every input,
  * including whitespace classes where `split('\s+')` disagrees with
  * Character.isWhitespace.
  */
case class NormTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SketchHash.tokenize(input.asInstanceOf[UTF8String].toString).length.toLong)

  override protected def withNewChildInternal(newChild: Expression): NormTokenCount =
    copy(child = newChild)
}

private[graft] object SketchHash {
  /** xxhash64 of a UTF8String under `seed` (Spark's XXH64, zero-copy). */
  @inline def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** One-pass text normalization + whitespace tokenization: trim, strip
    * accents (NFKD only when non-ASCII present), lowercase, split on
    * whitespace runs. Same semantics as `normText` + split, but a single
    * char scan instead of four interpreted regex/normalizer expressions —
    * the regex chain measured ~1 ms per 3 KB document.
    */
  def tokenize(raw: String): Array[String] = {
    var s = raw
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (!ascii) {
      val norm = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
      val sb = new java.lang.StringBuilder(norm.length)
      var j = 0
      while (j < norm.length) {
        val c = norm.charAt(j)
        val t = Character.getType(c)
        if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.append(c)
        j += 1
      }
      s = sb.toString
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val tok = new java.lang.StringBuilder(32)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (tok.length > 0) { out += tok.toString; tok.setLength(0) }
      } else tok.append(Character.toLowerCase(c))
      i += 1
    }
    if (tok.length > 0) out += tok.toString
    out.toArray
  }
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

/** 64-bit SimHash of RAW text (Charikar): bit j set when the ±1 sum of
  * token-hash bit j over all tokens is positive. Tokenization happens
  * inside (SketchHash.tokenize, one char scan).
  */
case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = SketchHash.tokenize(input.asInstanceOf[UTF8String].toString)
    val counts = new Array[Int](64)
    var i = 0
    val n = toks.length
    while (i < n) {
      val h = SketchHash.hash(UTF8String.fromString(toks(i)), 42L)
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

/** Dot product of two numeric arrays (float or double elements), accumulated
  * in double. Native because the `zip_with`+`aggregate` formulation pays
  * interpreted-lambda dispatch per element — ~10µs per 64-dim pair vs ~40ns
  * here. Nulls propagate; mismatched lengths use the shorter prefix.
  */
case class VecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Content-defined chunk boundaries (LBFS/FastCDC family, public
  * rolling-hash math): cut where a polynomial rolling hash of the last
  * `window` chars has its low `maskBits` bits zero, bounded by
  * [minLen, maxLen]. Because a boundary depends only on the LOCAL window
  * content, inserting or deleting text re-synchronizes the cut points a
  * few chunks downstream — unlike fixed-size chunking, where one inserted
  * char shifts every later boundary and defeats chunk-level dedup. One
  * tight O(chars) loop per row; concatenating the chunks reproduces the
  * input exactly.
  */
case class CdcChunks(child: Expression, window: Int, maskBits: Int,
    minLen: Int, maxLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 2 && minLen >= window && maxLen > minLen,
    s"need window >= 2 <= minLen < maxLen; got w=$window min=$minLen max=$maxLen")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val mask: Long = (1L << maskBits) - 1
  // Remove-term multiplier: POLY^(window-1) for h = h*POLY + c.
  private val POLY = 1099511628211L // FNV-64 prime — any odd 64-bit works
  private val powW: Long = {
    var p = 1L; var i = 0
    while (i < window - 1) { p *= POLY; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i).toLong
      h = h * POLY + c
      if (i - start + 1 > window) h -= s.charAt(i - window).toLong * powW * POLY
      val len = i - start + 1
      // Never cut between the halves of a surrogate pair: chunks become
      // UTF-8 (UTF8String), and a lone surrogate encodes as '?' —
      // silently corrupting non-BMP text at chunk joins. Deferring the
      // cut by one char keeps chunks valid; the max-length bound loosens
      // to maxLen+1 only at a pair boundary (never on BMP-only text, so
      // the cross-engine oracle over the ASCII corpus is unaffected).
      val splitsPair = Character.isHighSurrogate(s.charAt(i)) && i + 1 < n &&
        Character.isLowSurrogate(s.charAt(i + 1))
      if (!splitsPair &&
          (len >= maxLen || (len >= minLen && (h & mask) == 0L))) {
        out += UTF8String.fromString(s.substring(start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(s.substring(start, n))
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
