package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pack, TextDedup}
import graft.sources.Tables

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def documents = Tables.documents(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------
  // spanDedup
  // ------------------------------------------------------------------

  test("spanDedup: unique corpus passes through whole; repeated span keeps first occurrence") {
    val a = (1 to 10).map(i => s"w$i").mkString(" ")   // doc 1: one 10-word span
    val b = (11 to 20).map(i => s"w$i").mkString(" ")  // doc 2: a fresh span
    val docs = Seq((1L, a), (2L, b), (3L, a + " " + b), (4L, a)).toDF("doc_id", "text")
    val out = TextDedup.spanDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    // doc 3 is both spans already seen → fully deduped; doc 4 likewise.
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0) == ((1L, a, 1L)))
    assert(out(1) == ((2L, b, 1L)))
  }

  test("spanDedup: surviving spans reassemble in original position order") {
    val s1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val s2 = (1 to 10).map(i => s"b$i").mkString(" ")
    val s3 = (1 to 10).map(i => s"c$i").mkString(" ")
    // doc 2 repeats s2 in the middle — keeps s1', s3' around the hole.
    val docs = Seq((1L, s2), (2L, s1 + " " + s2 + " " + s3)).toDF("doc_id", "text")
    val out = TextDedup.spanDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out(1)._2 == s1 + " " + s3)
    assert(out(1)._3 == 2L)
  }

  test("spanDedup: total kept spans == distinct spans in corpus") {
    val docs = documents
    val kept = TextDedup.spanDedup(docs, "doc_id", "text")
      .agg(sum("n_kept")).as[Long].head
    val distinctSpans = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(expr("explode(sequence(0L, (size(t) + 9) div 10 - 1))").as("i"), col("t"))
      .select(expr("array_join(slice(t, CAST(i * 10 + 1 AS INT), 10), ' ')").as("ch"))
      .distinct().count()
    assert(kept == distinctSpans)
  }

  // ------------------------------------------------------------------
  // seqPack
  // ------------------------------------------------------------------

  test("seqPack: two-phase prefix sums equal the single-window reference; invariants hold") {
    val docs = documents
    val out = Pack.seqPack(docs, "doc_id", "text", capacity = 256, bucketRows = 7)
    // Reference: one global window (fine at spec scale).
    val ref = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_end", sum("n_tok").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("n_tok"),
        expr("(cum_end - n_tok) div 256").as("bin"),
        expr("(cum_end - n_tok) % 256").as("bin_off"),
        expr("(cum_end - 1) div 256 - (cum_end - n_tok) div 256 + 1").as("n_bins"))
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
    val bad = out.filter(col("bin_off") < 0 || col("bin_off") >= 256 || col("n_bins") < 1).count()
    assert(bad == 0)
  }

  test("seqPack: stream offsets are contiguous — each doc starts where the previous ended") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i")).toDF("doc_id", "text")
    val out = Pack.seqPack(docs, "doc_id", "text", capacity = 4, bucketRows = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect()
    // (doc_id, n_tok, bin, bin_off, n_bins): stream = 3,2,4 tokens, C=4
    assert(out(0) == ((1L, 3L, 0L, 0L, 1L)))
    assert(out(1) == ((2L, 2L, 0L, 3L, 2L)))  // straddles bins 0→1
    assert(out(2) == ((3L, 4L, 1L, 1L, 2L)))
  }

  // ------------------------------------------------------------------
  // SpaceSaving heavy hitters
  // ------------------------------------------------------------------

  test("heavyHitters: exact when distinct items fit in capacity") {
    val df = Seq.tabulate(300)(i => s"w${i % 7}").toDF("tok")
    val out = df.agg(graft.functions.heavyHitters(col("tok"), 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.count_hi", "e.count_lo")
      .as[(String, Long, Long)].collect()
    assert(out.length == 7)
    // 300 = 42*7 + 6: w0..w5 get 43, w6 gets 42; hi == lo == exact.
    out.foreach { case (item, hi, lo) =>
      val exact = if (item == "w6") 42L else 43L
      assert(hi == exact && lo == exact, s"$item: hi=$hi lo=$lo exact=$exact")
    }
  }

  test("heavyHitters: bounds stay sound under overflow and partial-merge") {
    // Skewed stream: heavy items far above the eviction floor, a tail
    // wider than capacity, spread over partitions to force merges.
    val rows = (Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (0 until 200).map(i => s"cold${i % 40}"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("tok")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = df.agg(graft.functions.heavyHitters(col("tok"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.count_hi", "e.count_lo")
      .as[(String, Long, Long)].collect()
    // Soundness: lo <= true <= hi for every reported item.
    out.foreach { case (item, hi, lo) =>
      assert(lo <= exact(item) && exact(item) <= hi,
        s"$item: [$lo, $hi] excludes true ${exact(item)}")
    }
    // The true heavy hitters are reported, in order, ahead of the tail.
    val items = out.map(_._1).toSeq
    assert(items.indexOf("hot1") == 0 && items.indexOf("hot2") == 1,
      s"heavy hitters missing/misordered: $items")
    // The hot counts are exact: they are never evicted, and the merge
    // only inflates hi for items some summary missed.
    val byItem = out.map(t => t._1 -> t).toMap
    assert(byItem("hot1")._3 <= 500L && byItem("hot1")._2 >= 500L)
  }

  // ------------------------------------------------------------------
  // WelfordVar
  // ------------------------------------------------------------------

  test("WelfordVar matches the exact decimal-component variance across partitionings") {
    val xs = Seq.tabulate(500)(i => 100000.0 + (i % 37) * 0.25) // mean² >> var
    val exact = {
      val n = xs.size
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      (sxx - sx * sx / n) / n
    }
    for (parts <- Seq(1, 7)) {
      val ds = spark.createDataset(xs).repartition(parts)
      val got = ds.select(graft.functions.WelfordVar.toColumn).head()
      assert(math.abs(got - exact) < 1e-6,
        s"parts=$parts welford=$got exact=$exact")
    }
    // Empty input → NaN, not a crash.
    assert(spark.createDataset(Seq.empty[Double])
      .select(graft.functions.WelfordVar.toColumn).head().isNaN)
  }

  // ------------------------------------------------------------------
  // docChunk
  // ------------------------------------------------------------------

  test("docChunk: empty text yields exactly one empty chunk") {
    val out = Pack.docChunk(Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L, "", 0L)))
  }

  test("docChunk: offsets stride correctly, full coverage, bounded length") {
    val docs = Seq((1L, "x" * 500), (2L, "y" * 150), (3L, "z")).toDF("doc_id", "text")
    val out = Pack.docChunk(docs, "doc_id", "text", size = 200, stride = 150)
      .orderBy("doc_id", "chunk_idx").as[(Long, Long, String, Long)].collect()
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 4 && d1.map(_._4).toSeq == Seq(200L, 200L, 200L, 50L))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq(150L))
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq(1L))
    // Coverage: chunk i covers [i*stride, i*stride + len); union covers the doc.
    assert(d1.zipWithIndex.forall { case ((_, ci, _, _), i) => ci == i })
  }
}
