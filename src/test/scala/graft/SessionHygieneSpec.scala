package graft

import org.scalatest.funsuite.AnyFunSuite

/** Long-lived-session hygiene (r14 verdict item 5): a LIBRARY user
  * running many heavy graft queries in ONE SparkSession must not
  * accumulate shuffle scratch / block-manager state without bound —
  * the cleaner-starvation mechanism Bench's GC-reset knob works around
  * (shuffle files and broadcasts are reclaimed by ContextCleaner only
  * when their driver-side references are GC'd) must have a documented,
  * tested library-side answer: [[GraftSession.reclaimScratch]].
  *
  * The bound pinned here: after reclaimScratch, the session's on-disk
  * scratch (every `blockmgr-*` tree of this JVM — shuffle data/index
  * files, disk-tier cache blocks) returns to within one heavy query's
  * footprint of its post-first-query baseline, for N heavy dedup-tier
  * queries — NOT the per-query-monotone growth of an unmanaged session.
  */
class SessionHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  /** (total bytes, file count) across this JVM's blockmgr scratch trees.
    * Local-mode driver and executor share one blockmgr dir under
    * java.io.tmpdir (no spark.local.dir is set in tests); stale trees
    * from previous forked JVMs are removed by their shutdown hooks, and
    * any survivor is CONSTANT across our samples, so deltas are ours.
    */
  private def scratch(): (Long, Long) = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val roots = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
    var bytes = 0L; var files = 0L
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      else { bytes += f.length(); files += 1 }
    roots.foreach(walk)
    (bytes, files)
  }

  /** Reclaim and poll until the scratch stops shrinking (the cleaner is
    * async — one fixed sleep under-waits on a loaded box). Returns the
    * settled (bytes, files).
    */
  private def reclaimSettled(): (Long, Long) = {
    GraftSession.reclaimScratch(spark)
    var prev = scratch()
    var stable = 0
    var spins = 0
    while (stable < 2 && spins < 30) {
      Thread.sleep(300)
      val cur = scratch()
      if (cur == prev) stable += 1 else stable = 0
      prev = cur
      spins += 1
    }
    prev
  }

  test("N heavy dedup queries in one session: reclaimScratch returns the " +
      "shuffle scratch to baseline every time — no per-query monotone " +
      "growth in bytes or file count") {
    // The dedup tier — the heaviest shuffle producers on the board.
    val tier = Seq("d_dedup_minhash_lsh", "d_dedup_ppjoin", "d_dedup_ngram_sketch")
    tier.foreach(q => assert(SparkEntry.queries.contains(q), s"missing $q"))
    val runs = tier ++ tier // 6 heavy queries, one session
    val samples = runs.map { q =>
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      assert(n > 0, s"$q returned no rows — vacuous hygiene run")
      reclaimSettled()
    }
    val (bytes, files) = samples.unzip
    val (b0, f0) = (bytes.head, files.head)
    // Documented bound: every post-reclaim sample within one first-query
    // footprint (+ a fixed 16 MiB / 64-file slack for engine-internal
    // residue) of the first sample. An unmanaged session grows by
    // roughly b0/f0 PER QUERY here, so the bound separates the regimes
    // by construction from the second query on.
    samples.zipWithIndex.foreach { case ((b, f), i) =>
      assert(b <= 2L * b0 + (16L << 20),
        s"run $i: scratch bytes $b exceed bound (baseline $b0, all $bytes)")
      assert(f <= 2L * f0 + 64L,
        s"run $i: scratch file count $f exceeds bound (baseline $f0, all $files)")
    }
  }
}
