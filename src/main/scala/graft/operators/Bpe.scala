package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SketchHash

/** Byte-pair-encoding tokenization (SURVEY.md §2.3): learn merges from the
  * corpus, apply them per document. The scale split follows standard
  * practice (and what HF-style trainers do): the WORD-FREQUENCY table is
  * computed distributed (explode → groupBy → top-K — one shuffle over
  * token counts, never raw text), and merge learning runs driver-side
  * over that compact table; application is a native expression with the
  * learned ranks baked in — a narrow, shuffle-free pass at any corpus
  * size.
  */
object Bpe {

  /** Learn `numMerges` merges from (word, count) pairs. Deterministic:
    * ties on pair frequency break lexicographically.
    */
  def train(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += joined; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Word-frequency table from a corpus (distributed), truncated to the
    * `maxWords` most frequent words — deterministic order (count desc,
    * word asc). Tokenized with the SAME SketchHash.tokenize the applier
    * uses (a normText/regex split disagrees on non-ASCII whitespace and
    * final-sigma lowercasing, silently disabling learned merges there).
    */
  def wordCounts(df: DataFrame, textCol: String, maxWords: Int): Seq[(String, Long)] =
    df.select(explode(GraftBridge.column(
        graft.functions.Tokens(GraftBridge.expression(col(textCol))))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toIndexedSeq

  /** Train merges straight from a corpus column. */
  def trainFromCorpus(df: DataFrame, textCol: String,
      numMerges: Int = 100, maxWords: Int = 5000): Seq[(String, String)] =
    train(wordCounts(df, textCol, maxWords), numMerges)

  /** BPE token count of a text column under the learned merges. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(text), merges))

  /** BPE token IDS of a text column — what the packing/training step
    * actually consumes. Stable id scheme with no separate vocab file:
    * single-char symbols use their codepoint, merged symbols use
    * 0x110000 + merge rank (above the Unicode range, so the two spaces
    * never collide). Deterministic for a given merge list.
    */
  def encodeIds(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(text), merges))

  /** The greedy rank-ordered merge loop shared by count/encode: repeatedly
    * merge the lowest-rank adjacent pair until none applies.
    */
  private[operators] def mergeWord(w: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms = w.map(_.toString).toArray
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = syms(bestIdx) + syms(bestIdx + 1)
        val out = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, out, 0, bestIdx)
        out(bestIdx) = merged
        System.arraycopy(syms, bestIdx + 2, out, bestIdx + 1, syms.length - bestIdx - 2)
        syms = out
      }
    }
    syms
  }
}

/** Token count after greedy rank-ordered BPE merges (the standard apply
  * loop: repeatedly merge the lowest-rank adjacent pair). Tokenization
  * matches the trainer's (SketchHash.tokenize).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val toks = SketchHash.tokenize(input.asInstanceOf[UTF8String].toString)
    var total = 0L
    var i = 0
    while (i < toks.length) { total += Bpe.mergeWord(toks(i), ranks).length; i += 1 }
    java.lang.Long.valueOf(total)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** BPE symbol IDS after the same greedy merge loop (array<long>):
  * codepoint for single-char symbols, 0x110000 + rank for merged ones.
  * One narrow shuffle-free pass like the counter; ids concatenate back
  * to the tokenized text losslessly (spec'd).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  @transient private lazy val symbolId: Map[String, Long] =
    merges.zipWithIndex.map { case ((a, b), r) => (a + b) -> (0x110000L + r) }.toMap

  private def idOf(sym: String): Long =
    if (sym.length == 1) sym.charAt(0).toLong
    else symbolId.getOrElse(sym,
      // Multi-char symbol not in the merge table cannot be produced by
      // the loop; guard anyway (surrogate pairs arrive as 2 chars).
      sym.codePointAt(0).toLong)

  override def nullSafeEval(input: Any): Any = {
    val toks = SketchHash.tokenize(input.asInstanceOf[UTF8String].toString)
    val out = mutable.ArrayBuilder.make[Long]
    var i = 0
    while (i < toks.length) {
      val syms = Bpe.mergeWord(toks(i), ranks)
      var j = 0
      while (j < syms.length) { out += idOf(syms(j)); j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
