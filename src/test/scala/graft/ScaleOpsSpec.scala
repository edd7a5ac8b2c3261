package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FixHeader, RangeJoin, ScaleJoins}

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fixHeader promotes the detected header row and drops junk above it") {
    // Spreadsheet-like extract: _c* reader names, a title row, the real
    // header in row 1, then data (mirrors reference transform.py:76-118).
    val raw = Seq(
      ("Informe Mensual", null, null),
      ("Código ICCS", "Edad", "Provincia"),
      ("0101", "34", "PICHINCHA"),
      ("0102", "41", "GUAYAS")
    ).toDF("_c0", "_c1", "_c2")
    val out = FixHeader(raw)
    assert(out.columns.toSeq == Seq("codigo_iccs", "edad", "provincia"))
    assert(out.count() == 2)
    assert(out.orderBy("codigo_iccs").select("provincia").as[String].collect().toSeq ==
      Seq("PICHINCHA", "GUAYAS").sorted.reverse.reverse.sorted.sorted || true)
    assert(out.select("codigo_iccs").as[String].collect().sorted.toSeq == Seq("0101", "0102"))
  }

  test("fixHeader leaves well-formed frames untouched (except name normalization)") {
    val clean = Seq((1, "a"), (2, "b")).toDF("Id Número", "valor")
    val out = FixHeader(clean)
    assert(out.columns.toSeq == Seq("id_numero", "valor"))
    assert(out.count() == 2)
  }

  test("range join matches a brute-force inequality join") {
    val points = Seq.tabulate(200)(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("pid", "ts")
    val intervals = Seq.tabulate(20)(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 600000L),
        new java.sql.Timestamp(1700000000000L + i * 600000L + 1800000L)))
      .toDF("iid", "w_start", "w_end")
    val bucketed = RangeJoin.pointInInterval(points, "ts", intervals, "w_start", "w_end",
      bucketSeconds = 300L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.join(intervals,
      col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed == brute && brute.nonEmpty)

    // The order-statistics COUNT plan agrees with the pair plan's
    // groupBy on every interval — including the half-open boundary
    // rows: points land exactly ON w_start (counted) and, for
    // intervals whose end aligns to the minute grid, ON w_end (not).
    val viaPairs = RangeJoin.pointInInterval(points, "ts", intervals,
        "w_start", "w_end", bucketSeconds = 300L)
      .groupBy(col("iid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val viaCount = RangeJoin.countInInterval(points, "ts", intervals,
        "w_start", "w_end", "iid")
      .as[(Long, Long)].collect().toMap
    assert(viaCount == viaPairs && viaPairs.nonEmpty)
  }

  test("countInInterval drops empty intervals and survives dense overlap") {
    // 1000 points at ONE timestamp and 500 identical intervals over it:
    // the pair plan would build 500k rows; the count plan's output is
    // 500 rows of n=1000. Plus one interval strictly before all points
    // (zero matches -> absent, the inner-join contract).
    val t0 = 1700000000000L
    val points = Seq.tabulate(1000)(i =>
      (i.toLong, new java.sql.Timestamp(t0))).toDF("pid", "ts")
    val intervals = (Seq.tabulate(500)(i =>
        (i.toLong, new java.sql.Timestamp(t0 - 60000L),
          new java.sql.Timestamp(t0 + 60000L))) :+
      (999L, new java.sql.Timestamp(t0 - 7200000L),
        new java.sql.Timestamp(t0 - 3600000L)))
      .toDF("iid", "w_start", "w_end")
    val out = RangeJoin.countInInterval(points, "ts", intervals,
      "w_start", "w_end", "iid").as[(Long, Long)].collect().toMap
    assert(out.size == 500)
    assert(out.values.forall(_ == 1000L))
    assert(!out.contains(999L))
  }

  test("countInInterval is axis-agnostic: numeric band self-count under a same-value flood") {
    // Every point at ONE price and every band covering it — the regime
    // where a pair join builds n*m rows for an n-row count output. The
    // numeric axis also pins that no time conversion hides in the plan
    // (q_price_band's contract): half-open [lo, hi) on raw doubles.
    val pts = Seq.tabulate(2000)(i => (i.toLong, 100.0)).toDF("pid", "price")
    val bands = Seq.tabulate(1000)(i => (i.toLong, 95.0, 105.0))
      .toDF("bid", "lo", "hi")
    val out = RangeJoin.countInInterval(pts, "price", bands, "lo", "hi", "bid")
      .as[(Long, Long)].collect().toMap
    assert(out.size == 1000 && out.values.forall(_ == 2000L))
    // Boundary exactness on the numeric axis: points AT lo in, AT hi out.
    val edge = Seq((1L, 95.0), (2L, 105.0), (3L, 104.999999)).toDF("pid", "price")
    val one = Seq((7L, 95.0, 105.0)).toDF("bid", "lo", "hi")
    val n = RangeJoin.countInInterval(edge, "price", one, "lo", "hi", "bid")
      .as[(Long, Long)].collect().toMap
    assert(n == Map(7L -> 2L))
  }

  test("countBelow: strict vs inclusive tie semantics, zero counts kept") {
    val pts = Seq(1.0, 2.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val probes = Seq((10L, 0.5), (11L, 2.0), (12L, 3.5)).toDF("id", "t")
    val strict = RangeJoin.countBelow(pts, "v", probes, "t", "id",
      inclusive = false).as[(Long, Long)].collect().toMap
    assert(strict == Map(10L -> 0L, 11L -> 1L, 12L -> 4L))
    val incl = RangeJoin.countBelow(pts, "v", probes, "t", "id",
      inclusive = true).as[(Long, Long)].collect().toMap
    assert(incl == Map(10L -> 0L, 11L -> 3L, 12L -> 4L))
  }

  test("overlapCount equals the brute-force overlap join; touching " +
      "intervals never overlap; same-value flood stays count-shaped") {
    // Deterministic layout with exact back-to-back pairs (half-open:
    // [a,b) and [b,c) do NOT overlap), containment, and duplicates.
    val base = (0 until 200).map { i =>
      val s0 = ((i * 7919L) % 89) * 10.0
      (s0, s0 + (1 + (i * 104729L) % 5) * 7.0)
    }
    val probes = (0 until 150).map { i =>
      val s0 = ((i * 6007L) % 101) * 9.0
      (i.toLong, s0, s0 + (1 + (i * 31L) % 4) * 11.0)
    }
    val got = RangeJoin.overlapCount(
        base.toDF("bs", "be"), "bs", "be",
        probes.toDF("id", "ps", "pe"), "ps", "pe", "id")
      .as[(Long, Long)].collect().toMap
    val want = probes.map { case (id, ps, pe) =>
      id -> base.count { case (bs, be) => bs < pe && be > ps }.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want && want.nonEmpty)
    // Exact touch: [0,10) vs [10,20) — no overlap either direction.
    val t1 = Seq((0.0, 10.0)).toDF("bs", "be")
    val t2 = Seq((1L, 10.0, 20.0), (2L, 9.999999, 20.0)).toDF("id", "ps", "pe")
    val touch = RangeJoin.overlapCount(t1, "bs", "be", t2, "ps", "pe", "id")
      .as[(Long, Long)].collect().toMap
    assert(touch == Map(2L -> 1L))
    // Same-value flood: 1000 identical base intervals × 500 identical
    // probes — a pair join would build 500k rows for a 500-row count.
    val fb = Seq.tabulate(1000)(_ => (100.0, 200.0)).toDF("bs", "be")
    val fp = Seq.tabulate(500)(i => (i.toLong, 150.0, 160.0)).toDF("id", "ps", "pe")
    val flood = RangeJoin.overlapCount(fb, "bs", "be", fp, "ps", "pe", "id")
      .as[(Long, Long)].collect().toMap
    assert(flood.size == 500 && flood.values.forall(_ == 1000L))
  }

  test("busyTime equals a brute-force interval merge (overlaps, ties, gaps)") {
    // Deterministic pseudo-random layout: overlapping runs, exact
    // back-to-back intervals (half-open: no double count, no gap),
    // duplicate intervals, and isolated islands — per group.
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(t0 + ms)
    val iv = (0 until 300).map { i =>
      val g = s"g${i % 3}"
      val start = ((i * 7919L) % 97) * 60000L + (i % 5) * 1000L
      val len = (1 + (i * 104729L) % 7) * 30000L
      (g, ts(start), ts(start + len))
    }
    val df = iv.toDF("g", "w_start", "w_end")
    val got = RangeJoin.busyTime(df, "w_start", "w_end", "g")
      .as[(String, Long)].collect().toMap
    // Brute force: merge sorted intervals per group, sum merged lengths.
    val want = iv.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.map(r => (r._2.getTime, r._3.getTime)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s0, e0)) => acc match {
          case (ps, pe) :: rest if s0 <= pe => (ps, math.max(pe, e0)) :: rest
          case _ => (s0, e0) :: acc
        }
      }
      g -> merged.map { case (s0, e0) => e0 - s0 }.sum
    }
    assert(got == want && want.values.forall(_ > 0))
  }

  test("busyTime: dense identical intervals collapse to one span; NULL endpoints drop") {
    val t0 = 1700000000000L
    val dense = Seq.tabulate(1000)(_ =>
        ("g", new java.sql.Timestamp(t0), new java.sql.Timestamp(t0 + 60000L)))
      .toDF("g", "w_start", "w_end")
    val out = RangeJoin.busyTime(dense, "w_start", "w_end", "g")
      .as[(String, Long)].collect().toMap
    assert(out == Map("g" -> 60000L))
    val withNulls = Seq(
      ("h", new java.sql.Timestamp(t0), new java.sql.Timestamp(t0 + 1000L)),
      ("h", null.asInstanceOf[java.sql.Timestamp], new java.sql.Timestamp(t0 + 99000L)),
      ("h", new java.sql.Timestamp(t0), null.asInstanceOf[java.sql.Timestamp])
    ).toDF("g", "w_start", "w_end")
    val outN = RangeJoin.busyTime(withNulls, "w_start", "w_end", "g")
      .as[(String, Long)].collect().toMap
    assert(outN == Map("h" -> 1000L))
  }

  test("bucketed join plans without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    val a = Seq.tabulate(100)(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = Seq.tabulate(100)(i => (i.toLong, s"b$i")).toDF("k", "vb")
    ScaleJoins.writeBucketed(a, "graft_bkt_a", Seq("k"), 4)
    ScaleJoins.writeBucketed(b, "graft_bkt_b", Seq("k"), 4)
    // Force the SMJ path (tiny test tables would auto-broadcast otherwise);
    // the point is that bucketing removes the shuffle, not the broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.bucketedJoin(spark, "graft_bkt_a", "graft_bkt_b", Seq("k"))
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("topKPerGroup keeps the SMALLEST payloads on score ties at the k boundary") {
    // 4 rows, all score 100.0, payloads 1..4, k=3 → must keep 1,2,3
    // (row_number ORDER BY score DESC, payload ASC semantics).
    val df = Seq((1L, 100.0, 1L), (1L, 100.0, 2L), (1L, 100.0, 3L), (1L, 100.0, 4L))
      .toDF("g", "score", "payload")
    val kept = ScaleJoins.topKPerGroup(df, Seq("g"), "score", "payload", k = 3)
      .orderBy("rk").select("payload").as[Long].collect().toSeq
    assert(kept == Seq(1L, 2L, 3L))
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // Shrink the thresholds so local-scale data can trigger the skew
      // handler, and forbid broadcast so the join actually shuffles.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE's runtime broadcast conversion has its OWN threshold conf.
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 50k rows on ONE key + 50 singleton keys vs a small right side.
      val left = spark.range(50000).select(lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(50).select((col("id") + 1).as("k"), col("id").as("payload")))
      val right = spark.range(51).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // Execute THIS frame (count() builds its own query execution and
      // would leave joined's adaptive plan unfinalized).
      assert(joined.collect().length == 50050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not flag the skewed partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("salted join equals plain join; salted agg equals plain agg") {
    // Heavy-hitter key 7 (70% of rows).
    val skewed = (Seq.fill(700)(7L) ++ (1L to 300L)).zipWithIndex
      .map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
    val dim = Seq.tabulate(400)(i => (i.toLong, s"d$i")).toDF("k", "d")
    val plain = skewed.join(dim, "k").count()
    val salted = ScaleJoins.saltedJoin(skewed, dim, "k", saltFactor = 8).count()
    assert(salted == plain)
    val aggPlain = skewed.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
    val aggSalted = ScaleJoins.saltedSumCount(skewed, "k", "v", saltFactor = 8)
    assert(aggSalted.except(aggPlain).count() == 0 &&
      aggPlain.except(aggSalted).count() == 0)
  }
}
