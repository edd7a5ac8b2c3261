package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BucketedTable
import graft.streaming.StreamOps

/** The batch-cost merge sink: bucketed merge must be EQUIVALENT to the
  * legacy full read-merge-swap on every contract (plain, stamped, stale
  * re-delivery), while physically rewriting only the buckets a batch
  * touches.
  */
class BucketedTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft-bt-$tag").toString + "/t"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bucketed upsert == full-table upsert over the same batch sequence") {
    val bt = tmp("eq-b"); val full = tmp("eq-f")
    // Batch 1: 200 keys; batch 2: overlap 100..249 (updates + inserts);
    // batch 3: stale re-delivery of 50..99 with OLDER ts (must not
    // regress) plus within-batch duplicates for key 0.
    val b1 = Seq.tabulate(200)(i => (i.toLong, 10L, s"v$i")).toDF("k", "ts", "v")
    val b2 = Seq.tabulate(150)(i => ((i + 100).toLong, 20L, s"w$i")).toDF("k", "ts", "v")
    val b3 = (Seq.tabulate(50)(i => ((i + 50).toLong, 5L, s"stale$i")) ++
      Seq((0L, 30L, "dupA"), (0L, 30L, "dupB"))).toDF("k", "ts", "v")
    for (b <- Seq(b1, b2, b3)) {
      BucketedTable.upsert(b, bt, Seq("k"), numBuckets = 16,
        latestBy = Some("ts"), tieBreakers = Seq("v"))
      StreamOps.upsertIntoParquet(b, full, Seq("k"),
        latestBy = Some("ts"), tieBreakers = Seq("v"))
    }
    val got = sortedRows(BucketedTable.read(spark, bt))
    val want = sortedRows(spark.read.parquet(full))
    assert(got == want)
    // Spot-check the contracts directly: stale batch didn't regress,
    // within-batch dup kept the deterministic tie-break winner.
    val byK = BucketedTable.read(spark, bt).as[(Long, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byK(50L) == (10L, "v50"), "stale re-delivery must not regress")
    assert(byK(0L) == (30L, "dupA"), "tie-breaker must pick deterministically")
    assert(byK(150L) == (20L, "w50"))
  }

  test("stamped bucketed upsert == stamped full upsert") {
    val bt = tmp("st-b"); val full = tmp("st-f")
    val b1 = Seq.tabulate(30)(i => (i.toLong, s"a$i")).toDF("k", "v")
    val b2 = Seq.tabulate(30)(i => ((i + 15).toLong, s"b$i")).toDF("k", "v")
    BucketedTable.upsert(b1, bt, Seq("k"), numBuckets = 8, stamp = Some(lit(1L)))
    BucketedTable.upsert(b2, bt, Seq("k"), numBuckets = 8, stamp = Some(lit(2L)))
    StreamOps.upsertIntoParquet(b1, full, Seq("k"), stamp = Some(lit(1L)))
    StreamOps.upsertIntoParquet(b2, full, Seq("k"), stamp = Some(lit(2L)))
    assert(sortedRows(BucketedTable.read(spark, bt)) ==
      sortedRows(spark.read.parquet(full)))
    // inserted_at survives the re-write, updated_at advances (the
    // trigger semantics) — asserted on the bucketed side.
    val r = BucketedTable.read(spark, bt).as[(Long, String, Long, Long)]
      .collect().map(x => x._1 -> (x._3, x._4)).toMap
    assert(r(0L) == (1L, 1L) && r(20L) == (1L, 2L) && r(40L) == (2L, 2L))
  }

  test("merge rewrites ONLY the touched buckets; untouched files survive untouched") {
    val bt = tmp("touch")
    val big = Seq.tabulate(2000)(i => (i.toLong, 1L, i * 2)).toDF("k", "ts", "v")
    BucketedTable.upsert(big, bt, Seq("k"), numBuckets = 64, latestBy = Some("ts"))
    val fs = new Path(bt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileIds(): Map[String, Set[String]] =
      fs.listStatus(new Path(bt)).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("kb=")).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).map(_.getPath.getName).toSet
      }.toMap
    val before = fileIds()
    assert(before.size == 64, s"expected 64 bucket dirs, got ${before.size}")
    // A 3-key batch touches ≤ 3 buckets.
    val smallBatch = Seq((5L, 9L, -1), (6L, 9L, -2), (7L, 9L, -3)).toDF("k", "ts", "v")
    BucketedTable.upsert(smallBatch, bt, Seq("k"), numBuckets = 64,
      latestBy = Some("ts"))
    val after = fileIds()
    val changed = after.keySet.filter(kb => before(kb) != after(kb))
    assert(changed.size <= 3 && changed.nonEmpty,
      s"a 3-key batch must rewrite at most 3 buckets, changed: $changed")
    // Content still correct.
    val out = BucketedTable.read(spark, bt).as[(Long, Long, Int)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(out(5L) == -1 && out(6L) == -2 && out(7L) == -3 && out(8L) == 16)
    assert(out.size == 2000)
  }

  test("heal finishes an interrupted per-bucket swap in both crash windows") {
    val bt = tmp("heal")
    BucketedTable.upsert(
      Seq.tabulate(100)(i => (i.toLong, i)).toDF("k", "v"), bt, Seq("k"),
      numBuckets = 8)
    val fs = new Path(bt).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new Path(bt))
      .filter(_.getPath.getName.startsWith("kb=")).map(_.getPath)
    val b0 = buckets.head; val k0 = b0.getName.stripPrefix("kb=")
    val before = sortedRows(BucketedTable.read(spark, bt))
    // Window 1: live renamed aside, staged not yet in — heal restores.
    assert(fs.rename(b0, new Path(new Path(bt), s"_old_kb=$k0")))
    BucketedTable.heal(fs, new Path(bt))
    assert(fs.exists(b0))
    assert(sortedRows(BucketedTable.read(spark, bt)) == before)
    // Window 2: swap completed but _old not yet deleted — heal drops it.
    val oldCopy = new Path(new Path(bt), s"_old_kb=$k0")
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, b0, fs, oldCopy, false,
      spark.sparkContext.hadoopConfiguration))
    BucketedTable.heal(fs, new Path(bt))
    assert(!fs.exists(oldCopy) && fs.exists(b0))
    assert(sortedRows(BucketedTable.read(spark, bt)) == before)
    // And the `_old` dir never leaks into a plain read (underscore dirs
    // are invisible to Spark's listing) — covered by the equality above.
  }

  test("re-merging the same batch is a content no-op (crash-replay idempotence)") {
    val bt = tmp("idem")
    val b1 = Seq.tabulate(50)(i => (i.toLong, 1L, i)).toDF("k", "ts", "v")
    val b2 = Seq.tabulate(20)(i => ((i + 40).toLong, 2L, -i)).toDF("k", "ts", "v")
    BucketedTable.upsert(b1, bt, Seq("k"), numBuckets = 8, latestBy = Some("ts"))
    BucketedTable.upsert(b2, bt, Seq("k"), numBuckets = 8, latestBy = Some("ts"))
    val once = sortedRows(BucketedTable.read(spark, bt))
    BucketedTable.upsert(b2, bt, Seq("k"), numBuckets = 8, latestBy = Some("ts"))
    assert(sortedRows(BucketedTable.read(spark, bt)) == once)
  }

  test("first load lands data + meta atomically; meta-less non-empty targets are refused") {
    val bt = tmp("atomic")
    BucketedTable.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), bt, Seq("k"),
      numBuckets = 4)
    // Meta arrived in the SAME rename as the data (it was staged first),
    // so there is no loaded-but-meta-less crash window.
    assert(BucketedTable.meta(spark, bt).contains((4, Seq("k"))))
    val root = new Path(bt)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(bt + ".staging")), "staging dir must be gone")

    // Simulate the pre-fix crash artifact / a mistyped foreign dataset:
    // a non-empty target without the meta file. The next upsert must
    // REFUSE (the old behavior silently deleted the whole directory and
    // treated the call as a fresh first load — data loss).
    fs.delete(new Path(root, "_graft_buckets.json"), false)
    val e = intercept[java.io.IOException] {
      BucketedTable.upsert(Seq((3L, "c")).toDF("k", "v"), bt, Seq("k"),
        numBuckets = 4)
    }
    assert(e.getMessage.contains("refusing"))
    // The existing data survived the refusal.
    assert(spark.read.parquet(bt).count() == 2)
  }

  test("bucket-count and key mismatches fail loudly; meta round-trips") {
    val bt = tmp("meta")
    BucketedTable.upsert(Seq((1L, "a")).toDF("k", "v"), bt, Seq("k"),
      numBuckets = 32)
    assert(BucketedTable.meta(spark, bt).contains((32, Seq("k"))))
    // Later merges use the STORED bucket count (a different requested n
    // is ignored, not re-bucketed) — and changed keys are an error.
    BucketedTable.upsert(Seq((2L, "b")).toDF("k", "v"), bt, Seq("k"),
      numBuckets = 999)
    assert(BucketedTable.meta(spark, bt).contains((32, Seq("k"))))
    val e = intercept[IllegalArgumentException] {
      BucketedTable.upsert(Seq((3L, "c")).toDF("k", "v"), bt, Seq("v"))
    }
    assert(e.getMessage.contains("keys"))
    assert(BucketedTable.read(spark, bt).count() == 2)
  }

  test("upsertSink(buckets=Some(n)) drives the bucketed merge end-to-end") {
    val dropDir = Files.createTempDirectory("graft-btsink-in").toString
    val target = tmp("sink")
    val ckpt = Files.createTempDirectory("graft-btsink-c").toString
    Seq.tabulate(50)(i => (i.toLong, 1)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dropDir)
    Seq.tabulate(50)(i => ((i + 25).toLong, 2)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dropDir)
    StreamOps.upsertSink(
      spark.readStream.schema("k LONG, v INT")
        .option("maxFilesPerTrigger", 1).parquet(dropDir),
      target, ckpt, keys = Seq("k"), tieBreakers = Seq("v"),
      buckets = Some(16)).awaitTermination()
    val out = BucketedTable.read(spark, target)
    assert(out.count() == 75)
    assert(out.filter(col("k") < 25 && col("v") === 1).count() == 25)
    assert(out.filter(col("k") >= 25 && col("v") === 2).count() == 50)
    assert(BucketedTable.meta(spark, target).contains((16, Seq("k"))))
  }
}
