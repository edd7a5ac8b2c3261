package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.sources.Tables
import graft.streaming.Sessionize

class SessionizeIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("flatMapGroupsWithState sessionization closes sessions on idle gaps") {
    val gap = 1800000L // 30 min
    val t0 = 1700000000000L
    val events = Seq(
      // user 1: two sessions (events 3h apart), second stays open
      Sessionize.Event(1L, new java.sql.Timestamp(t0), "a"),
      Sessionize.Event(1L, new java.sql.Timestamp(t0 + 600000L), "b"),
      Sessionize.Event(1L, new java.sql.Timestamp(t0 + 3600000L * 3), "c"),
      // user 2: one session, then a much later event advances the
      // watermark far enough to time the first session out
      Sessionize.Event(2L, new java.sql.Timestamp(t0 + 300000L), "a"),
      Sessionize.Event(2L, new java.sql.Timestamp(t0 + 3600000L * 9), "z"))

    val dir = Files.createTempDirectory("graft-sess").toString
    // Two drops so the stream sees the late events in a second micro-batch.
    events.take(4).toDF().coalesce(1).write.mode("append").parquet(dir)
    events.drop(4).toDF().coalesce(1).write.mode("append").parquet(dir)

    val stream = Sessionize.sessions(
      spark.readStream.schema(events.toDF().schema)
        .option("maxFilesPerTrigger", 1).parquet(dir).as[Sessionize.Event],
      gapMillis = gap, watermark = "1 hour")
    val q = stream.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("sessions")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    // User 1's first session (2 events) closed by the gap; user 2's first
    // (1 event) closed by event-time timeout once the watermark passed.
    assert(got.contains((1L, 2L)))
    assert(got.contains((2L, 1L)))
  }

  test("batch execution emits every session (no watermark node present)") {
    val gap = 1800000L
    val t0 = 1700000000000L
    val events = Seq(
      Sessionize.Event(1L, new java.sql.Timestamp(t0), "a"),
      Sessionize.Event(1L, new java.sql.Timestamp(t0 + 600000L), "b"),
      Sessionize.Event(1L, new java.sql.Timestamp(t0 + 3600000L * 3), "c"),
      Sessionize.Event(2L, new java.sql.Timestamp(t0 + 300000L), "a")).toDS()
    val got = Sessionize.sessions(events, gapMillis = gap)
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    // All data present in batch → every session is final, including tails.
    assert(got == Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("updateSessions semantics: merge, backward-extend, watermark close, late fusion") {
    // Minimal GroupState fake for driving the pure update function.
    class FakeState(var opt: Option[Sessionize.OpenSessions], wm: Long = 0L)
        extends org.apache.spark.sql.streaming.GroupState[Sessionize.OpenSessions] {
      var removed = false
      var timeoutTs: Long = -1
      override def exists: Boolean = opt.isDefined
      override def get: Sessionize.OpenSessions = opt.get
      override def getOption: Option[Sessionize.OpenSessions] = opt
      override def update(s: Sessionize.OpenSessions): Unit = { opt = Some(s); removed = false }
      override def remove(): Unit = { opt = None; removed = true }
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = timeoutTs = t
      override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = wm
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    def ev(ms: Long) = Sessionize.Event(1L, new java.sql.Timestamp(ms), "e")
    def ss(s: Long, l: Long, n: Long) = Sessionize.SessionState(s, l, n)
    def open(ss: Sessionize.SessionState*) = Some(Sessionize.OpenSessions(ss.toList))
    val gap = 1000L

    // Gap split under a lagging watermark (wm=0): NOTHING is final yet —
    // both sessions stay open; timeout is set at the earliest close boundary.
    val st1 = new FakeState(None)
    val out1 = Sessionize.updateSessions(gap)(1L, Iterator(ev(0), ev(5000)), st1).toSeq
    assert(out1.isEmpty)
    assert(st1.opt.get.sessions == List(ss(0, 0, 1), ss(5000, 5000, 1)))
    assert(st1.timeoutTs == 1000)

    // Backward extension: late event within gap BEFORE stored start.
    val st2 = new FakeState(open(ss(2000, 2500, 2)))
    val out2 = Sessionize.updateSessions(gap)(1L, Iterator(ev(1500)), st2).toSeq
    assert(out2.isEmpty)
    assert(st2.opt.get.sessions == List(ss(1500, 2500, 3)))

    // THE lagging-watermark case: sessions [0,0] and [4000,4000] both open
    // (wm=0), then a late event at t=2000 with gap=3000 fuses ALL THREE
    // into one session [0,4000] — nothing was prematurely emitted.
    val g3 = 3000L
    val st3 = new FakeState(open(ss(0, 0, 1), ss(4000, 4000, 1)))
    val out3 = Sessionize.updateSessions(g3)(1L, Iterator(ev(2000)), st3).toSeq
    assert(out3.isEmpty)
    assert(st3.opt.get.sessions == List(ss(0, 4000, 3)))
    assert(st3.timeoutTs == 7000)

    // Watermark passed a session's boundary → it closes; younger stays open.
    val st4 = new FakeState(open(ss(0, 500, 2)), wm = 2000L)
    val out4 = Sessionize.updateSessions(gap)(1L, Iterator(ev(4000)), st4).toSeq
    assert(out4.map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events)) ==
      Seq((0L, 500L, 2L)))
    assert(st4.opt.get.sessions == List(ss(4000, 4000, 1)) && st4.timeoutTs == 5000)

    // Far-earlier late events sessionize among themselves but stay OPEN
    // until the watermark passes them (wm=0 here).
    val st5 = new FakeState(open(ss(10000, 10500, 2)))
    val out5 = Sessionize.updateSessions(gap)(1L, Iterator(ev(100), ev(500)), st5).toSeq
    assert(out5.isEmpty)
    assert(st5.opt.get.sessions == List(ss(100, 500, 2), ss(10000, 10500, 2)))
    assert(st5.timeoutTs == 1500) // earliest close boundary

    // Timeout path: expired sessions flush, still-open ones stay.
    val st6 = new FakeState(open(ss(0, 500, 3), ss(9000, 9500, 1)), wm = 2000L) {
      override def hasTimedOut: Boolean = true
    }
    val out6 = Sessionize.updateSessions(gap)(1L, Iterator.empty, st6).toSeq
    assert(out6.map(_.n_events) == Seq(3))
    assert(st6.opt.get.sessions == List(ss(9000, 9500, 1)) && st6.timeoutTs == 10500)

    // Timeout with everything expired → state removed.
    val st7 = new FakeState(open(ss(0, 500, 3)), wm = 2000L) {
      override def hasTimedOut: Boolean = true
    }
    val out7 = Sessionize.updateSessions(gap)(1L, Iterator.empty, st7).toSeq
    assert(out7.map(_.n_events) == Seq(3) && st7.removed)
  }

  test("IVF search: perfect recall when probing all cells, sane recall at nProbe=4") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val model = IvfIndex.train(emb, "embedding", k = 8)
    assert(model.k == 8)
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", model)
    // Every vector lands in exactly one cell.
    assert(assigned.count() == emb.count())
    assert(assigned.agg(min(col("cell")), max(col("cell"))).as[(Int, Int)].head()._2 < 8)

    val brute = graft.operators.Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val full = IvfIndex.search(assigned, queries, "vec_id", "embedding", model,
      k = 5, nProbe = 8).select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(full == brute) // probing every cell == exact
    val probed = IvfIndex.search(assigned, queries, "vec_id", "embedding", model,
      k = 5, nProbe = 4).select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = probed.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("SemDeDup: scaled/near copies collapse within cells, distinct vectors survive") {
    import graft.operators.SemDedup
    val dim = 8
    def v(xs: Double*): Seq[Float] =
      (xs ++ Seq.fill(dim - xs.size)(0.0)).map(_.toFloat)
    val emb = Seq(
      (1L, v(1.0)), (2L, v(0.9)), // scaled copy: cosine 1.0
      (3L, v(0.99, 0.01)), // near copy of 1: cosine ≈ 0.9999
      (10L, v(0.0, 1.0)), (11L, v(0.0, 0.8)), // second dup group
      (20L, v(0.0, 0.0, 1.0)), // distinct singles
      (21L, v(0.0, 0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.train(emb, "embedding", k = 3, seed = 42L)

    val kept = SemDedup.semanticDedup(emb, "vec_id", "embedding", model, tau = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 20L, 21L),
      "min id survives each semantic group; distinct vectors untouched")

    // Oversized-cell guard: with maxCell=1 every cell refines by
    // hyperplane sign bits — identical-direction vectors share the
    // sub-bucket by construction, so true duplicate pairs still surface.
    val pairs = SemDedup.semanticPairs(emb, "vec_id", "embedding", model,
      tau = 0.99, maxCell = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "scaled copies survive the refinement")
    // And the refinement stays a strict subset of the unguarded pairs.
    val full = SemDedup.semanticPairs(emb, "vec_id", "embedding", model,
      tau = 0.99, maxCell = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(full))

    // Plan shape: candidates come from an EQUI-join on (cell, subcell) —
    // never a cartesian/nested-loop pass over the corpus — and the
    // k-sized cell-count side broadcasts.
    val plan = SemDedup.semanticPairs(emb, "vec_id", "embedding", model, tau = 0.99)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"quadratic plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"cell counts should broadcast:\n$plan")
  }

  test("join-based centroid assignment: exact at full probe, no centroid inlining") {
    import graft.operators.Similarity
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
    // Centroid table: 40 vectors drawn from the corpus itself (any size
    // works — the point is it's a DataFrame, not plan literals).
    val centroids = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val got = Similarity.centroidAssignJoin(emb, "vec_id", "embedding",
        centroids, "cid", "cvec", coarseK = 4, nProbe = 4)
      .select("id", "assigned").as[(Long, Long)].collect().toMap

    // Brute-force argmax (cosine desc, cid asc tiebreak) per vector.
    val brute = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .crossJoin(centroids)
      .withColumn("cosine", Similarity.cosine(col("vec"), col("cvec")))
      .groupBy("id").agg(max(struct(col("cosine"), col("cid"))).as("b"))
      .select(col("id"), col("b.cid")).as[(Long, Long)].collect().toMap
    assert(got.size == brute.size)
    // Ties (duplicate/identical centroids) break by max struct on BOTH
    // sides, so assignments must agree exactly at nProbe = coarseK.
    assert(got == brute, "full probe must recover the exact assignment")

    // Recall stays useful under pruning (the scale setting).
    val pruned = Similarity.centroidAssignJoin(emb, "vec_id", "embedding",
        centroids, "cid", "cvec", coarseK = 4, nProbe = 2)
      .select("id", "assigned").as[(Long, Long)].collect().toMap
    val agree = pruned.count { case (k, v) => brute.get(k).contains(v) }
    assert(agree.toDouble / brute.size >= 0.8, s"pruned agreement $agree/${brute.size}")
  }

  test("PQ: codes compress 32x, reconstruction is sane, ADC recall beats chance") {
    import graft.operators.PqIndex
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
    val model = PqIndex.train(emb, "embedding", m = 8, k = 64)
    assert(model.m == 8 && model.k == 64 && model.subDim == 8)

    val encoded = PqIndex.encode(emb, "vec_id", "embedding", model)
    val codes = encoded.as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.size == 8 && c.forall(j => j >= 0 && j < 64)))

    // Reconstruction error must be well under the trivial zero-codebook
    // baseline (= mean squared norm) — i.e. the codebooks learned SOMETHING.
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def mse(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum / a.size
    val reconErr = vecs.keys.map(id =>
      mse(vecs(id), PqIndex.decode(model, codes(id)).toSeq)).sum / vecs.size
    val zeroErr = vecs.values.map(v => mse(v, Seq.fill(v.size)(0.0))).sum / vecs.size
    assert(reconErr < zeroErr * 0.7, s"recon MSE $reconErr vs zero baseline $zeroErr")

    // ADC recall@10 vs exact L2 top-10 (self excluded on both sides).
    val queries = vecs.toSeq.sortBy(_._1).take(5)
      .map { case (id, v) => (id, v.toArray) }
    val got = PqIndex.searchADC(encoded, queries, model, topK = 10)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = queries.map { case (qid, q) =>
      val exact = vecs.filter(_._1 != qid).toSeq
        .sortBy { case (_, v) => mse(v, q.toSeq) }.take(10).map(_._1).toSet
      got(qid).intersect(exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean ADC recall@10 $mean below 0.4: $recalls")
  }

  test("persisted IVF index: saved codebook round-trips, probe prunes cell files") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
    // 2 queries × nProbe 3 ≤ 6 < 8 cells: pruning MUST skip some cell dir.
    val queries = emb.filter(col("vec_id") < 2)
    val model = IvfIndex.train(emb, "embedding", k = 8)
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", model)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfIndex.save(assigned, model, path)

    // Codebook round-trip is bit-exact (train once, reuse forever).
    val loaded = IvfIndex.loadModel(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)

    // Persisted search == in-memory search at the same (k, nProbe).
    val mem = IvfIndex.search(assigned, queries, "vec_id", "embedding", model,
      k = 5, nProbe = 3).select("query_id", "id", "rk")
      .as[(Long, Long, Int)].collect().toSet
    val persisted = IvfIndex.searchPersisted(spark, path, queries,
      "vec_id", "embedding", k = 5, nProbe = 3)
    assert(persisted.select("query_id", "id", "rk")
      .as[(Long, Long, Int)].collect().toSet == mem)

    // FILE-LEVEL pruning: the probe cells arrive at the index scan as a
    // STATIC PartitionFilter (inputFiles would lie here — it lists the
    // logical relation pre-pruning), so only probed cell directories are
    // listed/read — at 100 TB the unprobed (k − nProbe)/k of the corpus
    // is never touched.
    val plan = persisted.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[cell.* IN \\(([^)]*)\\)".r.findFirstMatchIn(plan)
    assert(pf.isDefined, s"no static cell IN partition filter on the index scan:\n$plan")
    val cellsProbed = pf.get.group(1).split(",").length
    assert(cellsProbed > 0 && cellsProbed <= 6,
      s"expected ≤ 2 queries × 3 probes cells in the partition filter, got $cellsProbed")
  }

  test("persisted IVF append: probe equals the union assigned with the same codebook") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.filter(col("vec_id") % 4 =!= 0)
    val b = emb.filter(col("vec_id") % 4 === 0)
    val queries = emb.filter(col("vec_id") < 2)
    val model = IvfIndex.train(a, "embedding", k = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf-append").toString
    IvfIndex.save(IvfIndex.assign(a, "vec_id", "embedding", model), model, path)
    IvfIndex.append(b, "vec_id", "embedding", path)
    val got = IvfIndex.searchPersisted(spark, path, queries,
        "vec_id", "embedding", k = 5, nProbe = 3)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet
    val want = IvfIndex.search(
        IvfIndex.assign(emb, "vec_id", "embedding", model),
        queries, "vec_id", "embedding", model, k = 5, nProbe = 3)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(got == want)
    // the appended rows really landed in the persisted inverted file
    assert(spark.read.parquet(path + "/index")
      .filter(col("id") % 4 === 0).count() > 0)
  }

  test("annLshPairs occupancy guard: flood bucket splits, exact dups never separate") {
    import graft.operators.Similarity
    // 800 vectors crammed into ONE primary bucket: tight cluster around a
    // base vector far from every plane boundary, plus 20 planted EXACT
    // duplicate pairs (identical vectors — identical sign bits under any
    // plane family, so no refinement bit can ever separate them).
    val dim = 16
    val planes = Similarity.hyperplanes(4, dim).map(_.toSeq).toSeq
    // The sf10 failure mode: a flood bucket of DIVERSE vectors that share
    // only the 4 coarse sign bits (few planes = few buckets, so random
    // directions pile up ~n/16 per bucket). Refinement planes DO split
    // such a bucket — unlike a near-identical clump, whose quadratic
    // pair-set is semantically required output. Build it by generating
    // random vectors and keeping the modal coarse bucket.
    def pdot(a: Array[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def bucketOf(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (p, i) => if (pdot(v, p) >= 0) 1L << i else 0L }.sum
    val rnd = new scala.util.Random(11)
    val pool = Vector.fill(16000)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val (modal, members) = pool.groupBy(bucketOf).maxBy(_._2.size)
    assert(members.size >= 780, s"modal bucket only ${members.size}")
    val crowd = members.take(760).zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val dups = members.slice(760, 780).zipWithIndex.flatMap { case (v, i) =>
      val vv = v.map(_.toFloat).toSeq
      Seq((10000L + 2 * i, vv), (10001L + 2 * i, vv))
    }
    val df = (crowd ++ dups).toDF("id", "vec")
    // Sanity: the cluster really floods one bucket (guard precondition).
    val buckets = df.select(Similarity.lshBucketFromPlanes(col("vec"), planes).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect()
    assert(buckets.map(_._2).max > 700, s"corpus must flood one bucket: $buckets")
    val pairs = Similarity.annLshPairs(df, "id", "vec", planes, maxBucket = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // Guard engaged: an unguarded flood bucket of 800 rows yields
    // ~320k pairs; ⌈log2(800/64)⌉ = 4 refinement bits cut expected
    // occupancy to ~50 — the pair count must collapse accordingly.
    assert(pairs.length < 60000, s"guard did not split the flood bucket: ${pairs.length} pairs")
    // Exact duplicates always share every refinement sign bit.
    val pairSet = pairs.toSet
    (0 until 20).foreach { i =>
      assert(pairSet.contains((10000L + 2 * i, 10001L + 2 * i)),
        s"exact-dup pair ${10000 + 2 * i} lost by refinement")
    }
    // Under the cap nothing changes: same call with a roomy cap equals
    // the unguarded all-pairs join of the flood bucket.
    val roomy = Similarity.annLshPairs(df, "id", "vec", planes, maxBucket = 100000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unguarded = {
      val b = df.select(col("id"),
        Similarity.lshBucketFromPlanes(col("vec"), planes).as("b"))
      b.as("a").join(b.as("bb"),
          col("a.b") === col("bb.b") && col("a.id") < col("bb.id"))
        .select(col("a.id"), col("bb.id")).as[(Long, Long)].collect().toSet
    }
    assert(roomy == unguarded, "below the cap the guard must be invisible")
  }
}
