package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SubstrIndex, TextDedup}

/** Persisted gram index for incremental exact-substring dedup (SURVEY
  * §2.3 row 43n). Core contract: with corpus ids preceding batch ids
  * (the crawl timeline), dedupBatch against the index == the batch rows
  * of a full-union substringDedup rerun; append keeps that equality for
  * later batches without touching the standing corpus.
  */
class SubstrIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("substr-ix").toString

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def collect(d: DataFrame): Set[(Long, String, Long)] =
    d.select("doc_id", "text_clean", "n_dropped")
      .as[(Long, String, Long)].collect().toSet

  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "one two three four five six seven eight nine ten",
    3L -> "red orange yellow green blue indigo violet white black grey")

  test("dedupBatch == full-union substringDedup restricted to the batch") {
    val path = tmp()
    SubstrIndex.build(df(corpus), "doc_id", "text", path, minTokens = 4)
    val batch = Seq(
      // embeds corpus doc 1's middle run after a fresh prefix
      10L -> "fresh start gamma delta epsilon zeta eta done",
      // batch-internal duplicate pair
      11L -> "micro kilo mega giga tera peta exa cool",
      12L -> "micro kilo mega giga tera peta exa cool",
      // clean doc
      13L -> "nothing here repeats at all trust me")
    val got = collect(SubstrIndex.dedupBatch(spark, path, df(batch),
      "doc_id", "text"))
    val want = collect(TextDedup.substringDedup(
        df(corpus ++ batch), "doc_id", "text", minTokens = 4)
      .filter(col("doc_id") >= 10))
    assert(got == want)
    // And the corpus hit really cut doc 10's embedded run.
    assert(got.exists { case (id, _, n) => id == 10L && n > 0 })
  }

  test("crash replay: dedupBatch after the batch's own append reproduces the pre-append output") {
    val path = tmp()
    SubstrIndex.build(df(corpus), "doc_id", "text", path, minTokens = 4)
    val batch = Seq(
      10L -> "fresh start gamma delta epsilon zeta eta done",
      11L -> "micro kilo mega giga tera peta exa cool",
      12L -> "micro kilo mega giga tera peta exa cool",
      13L -> "nothing here repeats at all trust me")
    val before = collect(SubstrIndex.dedupBatch(spark, path, df(batch),
      "doc_id", "text"))
    // Crash window: append committed, checkpoint didn't — the stream
    // replays the SAME batch against an index that already owns the
    // batch's grams under the batch's own doc ids. The replay guard
    // must make the probe ignore those postings, so the replayed output
    // is byte-identical (without it every window "hits" and the docs
    // re-emit fully cut).
    SubstrIndex.append(df(batch), "doc_id", "text", path)
    val replay = collect(SubstrIndex.dedupBatch(spark, path, df(batch),
      "doc_id", "text"))
    assert(replay == before,
      s"replayed batch diverged: ${replay -- before} vs ${before -- replay}")
    assert(replay.exists { case (id, t, _) => id == 11L && t.nonEmpty },
      "replayed doc lost its text — self-hit corruption")
    // And the replayed append is a no-op: grams already owned.
    val postings = spark.read.parquet(s"$path/grams")
    val cnt = postings.groupBy("h", "h2").count().filter(col("count") > 1).count()
    assert(cnt == 0, "replayed append duplicated postings")
    SubstrIndex.append(df(batch), "doc_id", "text", path)
    assert(spark.read.parquet(s"$path/grams").count() == postings.count())
  }

  test("append extends the corpus: batch2 dedups against corpus ∪ batch1") {
    val path = tmp()
    SubstrIndex.build(df(corpus), "doc_id", "text", path, minTokens = 4)
    val b1 = Seq(20L -> "lorem ipsum dolor sit amet consectetur adipiscing elit")
    SubstrIndex.append(df(b1), "doc_id", "text", path)
    val b2 = Seq(
      // repeats batch1's run — must be cut even though the CORPUS
      // never contained it
      30L -> "prefix words dolor sit amet consectetur suffix here",
      // repeats corpus doc 2
      31L -> "three four five six extra tail tokens here")
    val got = collect(SubstrIndex.dedupBatch(spark, path, df(b2),
      "doc_id", "text"))
    val want = collect(TextDedup.substringDedup(
        df(corpus ++ b1 ++ b2), "doc_id", "text", minTokens = 4)
      .filter(col("doc_id") >= 30))
    assert(got == want)
    assert(got.count { case (_, _, n) => n > 0 } == 2)
  }

  test("append after append == rebuild over the union (probe equality)") {
    val path = tmp(); val path2 = tmp()
    val b1 = Seq(20L -> "lorem ipsum dolor sit amet consectetur adipiscing elit")
    val b2 = Seq(25L -> "silver copper bronze gold platinum iron tin lead")
    SubstrIndex.build(df(corpus), "doc_id", "text", path, minTokens = 4)
    SubstrIndex.append(df(b1), "doc_id", "text", path)
    SubstrIndex.append(df(b2), "doc_id", "text", path)
    SubstrIndex.build(df(corpus ++ b1 ++ b2), "doc_id", "text", path2,
      minTokens = 4)
    val probe = Seq(40L ->
      "x1 dolor sit amet consectetur x2 silver copper bronze gold x3 three four five six x4")
    val a = collect(SubstrIndex.dedupBatch(spark, path, df(probe), "doc_id", "text"))
    val b = collect(SubstrIndex.dedupBatch(spark, path2, df(probe), "doc_id", "text"))
    assert(a == b)
    assert(a.head._3 > 0)
  }

  test("probe reads only touched buckets (static partition filter)") {
    val path = tmp()
    SubstrIndex.build(df(corpus), "doc_id", "text", path, minTokens = 4)
    val batch = df(Seq(50L -> "just a tiny probe batch of words"))
    val plan = SubstrIndex.dedupBatch(spark, path, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"expected a static bucket partition filter on the grams scan:\n$plan")
  }

  test("streaming gate: two id-ordered drops reproduce batch substringDedup") {
    val root = tmp()
    val drop = s"$root/drop"
    val low = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight")
    val high = Seq(
      10L -> "pre gamma delta epsilon zeta post tail here",
      11L -> "one two three four nine ten eleven twelve")
    df(low).repartition(2).write.mode("append").parquet(drop)
    Thread.sleep(1100) // distinct mod-times: drop order IS batch order
    df(high).coalesce(1).write.mode("append").parquet(drop)
    val src = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 2).parquet(drop)
    graft.streaming.StreamOps.substrDedupSink(src, s"$root/index",
      s"$root/out", s"$root/ckpt", "doc_id", "text", minTokens = 4)
      .awaitTermination()
    val got = collect(spark.read.parquet(s"$root/out"))
    val want = collect(TextDedup.substringDedup(
      df(low ++ high), "doc_id", "text", minTokens = 4))
    assert(got == want)
    assert(got.count { case (_, _, n) => n > 0 } == 2) // both high docs cut
  }

  test("dedupAndAppend == dedupBatch then append (output and index)") {
    val batch = Seq(
      10L -> "fresh start gamma delta epsilon zeta eta done",
      11L -> "micro kilo mega giga tera peta exa cool",
      12L -> "micro kilo mega giga tera peta exa cool",
      13L -> "nothing here repeats at all trust me")
    // Arm A: the two-call sequence the sink used before the shared pass.
    val pathA = tmp(); val outA = s"${tmp()}/out"
    SubstrIndex.build(df(corpus), "doc_id", "text", pathA, minTokens = 4)
    SubstrIndex.dedupBatch(spark, pathA, df(batch), "doc_id", "text")
      .write.mode("append").parquet(outA)
    SubstrIndex.append(df(batch), "doc_id", "text", pathA)
    // Arm B: the one-pass sink path.
    val pathB = tmp(); val outB = s"${tmp()}/out"
    SubstrIndex.build(df(corpus), "doc_id", "text", pathB, minTokens = 4)
    SubstrIndex.dedupAndAppend(spark, pathB, df(batch), "doc_id", "text", outB)
    assert(collect(spark.read.parquet(outB)) == collect(spark.read.parquet(outA)))
    val ix = (p: String) => spark.read.parquet(s"$p/grams")
      .select("h", "h2", "doc_id", "pos", "bucket")
      .as[(Long, Long, Long, Int, Int)].collect().toSet
    assert(ix(pathB) == ix(pathA))
  }

  test("untouched batch docs pass through whole") {
    val path = tmp()
    SubstrIndex.build(df(corpus), "doc_id", "text", path, minTokens = 4)
    val batch = Seq(60L -> "completely novel text with no overlap anywhere")
    val got = collect(SubstrIndex.dedupBatch(spark, path, df(batch),
      "doc_id", "text"))
    assert(got == Set((60L, batch.head._2, 0L)))
  }
}
