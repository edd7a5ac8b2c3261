package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DataPipelineQueries

/** Invariants and plan shapes for the curation operators
  * (DataPipelineQueries) beyond what the DuckDB oracles hash-check.
  */
class DataPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) =
    DataPipelineQueries.all.find(_.name == name).get.run(spark, sfDir)

  test("x_repetition fractions are well-formed and bounded") {
    val rows = q("x_repetition")
      .select("n_tokens", "dup_token_frac", "dup_2gram_frac")
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, f1, f2) =>
      assert(n > 0)
      assert(f1 >= 0.0 && f1 <= 1.0)
      assert(f2 >= 0.0 && f2 <= 1.0)
    }
    // The synthetic corpus shares a tiny vocabulary — duplicate tokens
    // must actually occur somewhere, or the metric is vacuous.
    assert(rows.exists(_._2 > 0.0))
  }

  test("x_contamination broadcasts the benchmark side and self-excludes") {
    val df = q("x_contamination")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side should broadcast:\n$plan")
    // Benchmark docs (doc_id < 10) never appear as contaminated corpus rows.
    assert(df.filter(col("doc_id") < 10).count() == 0)
  }

  test("x_source_quota caps every source at the quota") {
    val per = q("x_source_quota").groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    assert(per.nonEmpty)
    per.foreach { case (_, n) => assert(n <= 25) }
  }

  test("x_stratified_sample buckets respect per-language rates") {
    val rows = q("x_stratified_sample").select("lang", "bucket")
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, b) =>
      assert(b < (if (lang == "en") 10 else 50), s"lang=$lang bucket=$b")
    }
  }

  test("q_session_window agrees with the lag/cumsum sessionization") {
    // Same gap, two formulations: native session_window vs window-lag,
    // both at MICROSECOND precision with `diff > gap` starting a new
    // session (two events exactly gap apart merge) — the ms-truncating
    // q_events_sessionize twin would be data-dependently off by one.
    val native = q("q_session_window")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val viaLag = graft.sources.Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id")).agg(sum(col("new_s")).as("n_sessions_lag"))
    assert(native.join(viaLag, Seq("user_id"))
      .filter(col("n_sessions") =!= col("n_sessions_lag")).count() == 0)
    // Every event lands in exactly one session.
    val totalEvents = graft.sources.Tables.events(spark, sfDir).count()
    val sessionEvents = q("q_session_window").agg(sum(col("n_events"))).as[Long].head()
    assert(sessionEvents == totalEvents)
  }

  test("label centroid assignment partitions the corpus and is bit-stable") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val out = graft.operators.Similarity
      .labelCentroidAssign(emb, "vec_id", "embedding", "label")
    val rows = out.as[(Int, Int, Long)].collect()
    // Every vector is assigned exactly once.
    assert(rows.map(_._3).sum == emb.count())
    // Decimal-exact centroid means → identical output on a second run.
    val again = graft.operators.Similarity
      .labelCentroidAssign(emb, "vec_id", "embedding", "label")
      .as[(Int, Int, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("approximate distinct counts stay within the configured error bound") {
    val e = graft.sources.Tables.events(spark, sfDir)
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = e.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.1, s"$k: approx $a vs exact $n")
    }
  }

  test("approx deciles track exact ntile within tolerance, with no global sort") {
    val approx = SparkEntry.queries("q_ntile_approx")(spark, sfDir)
    // Scale shape: no global-order Window (that's q_ntile's cost), and
    // the only SinglePartition exchange is the sketch merge — crossed by
    // one constant-size partial buffer per partition, not by data rows.
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q_ntile_approx must not use a window:\n$plan")
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles == 1 && plan.contains("partial_percentile_approx"),
      s"q_ntile_approx: only the partial-sketch merge may be single-partition:\n$plan")
    val a = approx.select("decile", "n").as[(Int, Long)].collect().toMap
    val exact = SparkEntry.queries("q_ntile")(spark, sfDir)
      .select("decile", "n").as[(Int, Long)].collect().toMap
    assert(a.keySet == (1 to 10).toSet)
    val n = exact.values.sum
    (1 to 10).foreach { d =>
      assert(math.abs(a(d) - exact(d)).toDouble / (n / 10.0) <= 0.05,
        s"decile $d: approx ${a(d)} vs exact ${exact(d)}")
    }
  }

  test("x_ngram_freq is a deterministic top-20 by document frequency") {
    val a = q("x_ngram_freq").as[(String, Long)].collect()
    val b = q("x_ngram_freq").as[(String, Long)].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 20)
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq) // df descending
  }

  test("x_blocklist_filter counts whole tokens only and scores consistently") {
    import graft.operators.TextStats.stopwordHits
    // 'slowly' must NOT fire the 'slow' rule — token equality, not
    // substring match (the classic Scunthorpe failure of naive grep
    // blocklists). Checked directly on the hit counter the query uses.
    val df = Seq((1L, "slowly slow slowing slow"), (2L, "vector vectors"))
      .toDF("doc_id", "text")
    val toks = split(graft.functions.normText(col("text")), " ")
    val hits = df.select(col("doc_id"),
        stopwordHits(toks, Seq("slow")).as("slow"),
        stopwordHits(toks, Seq("vector")).as("vec"))
      .as[(Long, Int, Int)].collect()
      .map { case (id, a, b) => id -> (a, b) }.toMap
    assert(hits(1L) == (2, 0))
    assert(hits(2L) == (0, 1))
    // Corpus run: verdict thresholds are a function of the score column.
    val rows = q("x_blocklist_filter")
      .select("score", "verdict").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sc, v) =>
      val expect = if (sc >= 40) "drop" else if (sc >= 30) "flag" else "keep"
      assert(v == expect, s"score=$sc verdict=$v")
    }
    // All three routes must exist on the synthetic corpus, or the
    // thresholds are vacuous at this scale.
    assert(rows.map(_._2).distinct.length == 3, rows.map(_._2).distinct.toSeq)
  }

  test("x_math_density routes the augmented docs and only those") {
    val rows = q("x_math_density")
      .select("doc_id", "latex_cmds", "density_e6", "route")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, latex, dens, route) =>
      val expect = if (dens >= 15000 || latex >= 2) "math" else "prose"
      assert(route == expect, s"doc $id: dens=$dens latex=$latex route=$route")
      // LaTeX commands only come from the %7==0 augmentation.
      if (latex > 0) assert(id % 7 == 0)
      // Un-augmented docs are pure prose: zero symbol density.
      if (id % 7 != 0 && id % 7 != 3) assert(dens == 0 && route == "prose")
    }
    assert(rows.exists(_._4 == "math") && rows.exists(_._4 == "prose"))
  }

  test("x_hashed_bow is a signed multiset homomorphism over tokens") {
    val rows = q("x_hashed_bow")
      .select("doc_id", "bucket", "w").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, b, w) =>
      assert(id % 11 == 0)
      assert(b >= 0 && b < 64)
      assert(w != 0) // zero-weight buckets are filtered
    }
    // |per-doc signed sum| can never exceed the doc's token count, and
    // the featurizer is deterministic across runs (hash, not random).
    val again = q("x_hashed_bow")
      .select("doc_id", "bucket", "w").as[(Long, Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(r => math.abs(r._3)).sum)
    val nToks = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), graft.functions.normTokenCount(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    perDoc.foreach { case (id, s) =>
      assert(s <= nToks(id), s"doc $id: sum|w|=$s > tokens=${nToks(id)}")
    }
  }
}
