package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, IvfPq, PqIndex}
import graft.sources.Tables

/** The composed billion-scale ANN layout: IVF cell partitioning bounds
  * WHICH bytes a probe touches (file-level pruning), PQ codes bound HOW
  * MANY bytes per candidate. The spec pins the layout to its in-memory
  * constituents: a persisted probe must equal filtering the in-memory
  * encoded corpus to the same probe cells and running ADC.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def queriesOf(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.filter(col("vec_id") < n)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  test("build round-trips both models bit-exactly; search == in-memory ADC over the probed cells") {
    val emb = Tables.embeddings(spark, sfDir)
    val ivf = IvfIndex.train(emb, "embedding", k = 8, maxIter = 5)
    val pq = PqIndex.train(emb, "embedding", m = 8, k = 16, maxIter = 5)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    IvfPq.build(emb, "vec_id", "embedding", path, ivf, pq)

    assert(IvfPq.loadIvf(spark, path).centroids.map(_.toSeq).toSeq ==
      ivf.centroids.map(_.toSeq).toSeq)
    assert(IvfPq.loadPq(spark, path).codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

    val qs = queriesOf(emb, 3)
    val got = IvfPq.search(spark, path, qs, k = 5, nProbe = 3)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet

    // In-memory twin: same probe-cell derivation, same encoded corpus,
    // same ADC — the persisted layout must add nothing but the pruning.
    val probeCells = qs.flatMap { case (_, q) =>
      ivf.centroids.zipWithIndex.map { case (c, i) =>
        (q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.sortBy(_._1).take(3).map(_._2)
    }.distinct
    val encoded = PqIndex.encode(
      emb.withColumn("cell", IvfIndex.cellId(ivf, col("embedding")))
        .filter(col("cell").isin(probeCells.map(Int.box): _*)),
      "vec_id", "embedding", pq)
    val want = PqIndex.searchADC(encoded, qs, pq, topK = 5)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(got == want)

    // Probing ALL cells degenerates to full-corpus ADC — the pruning is
    // a cost lever, never a correctness one at full probe width.
    val full = IvfPq.search(spark, path, qs, k = 5, nProbe = 8)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet
    val fullWant = PqIndex.searchADC(
        PqIndex.encode(emb, "vec_id", "embedding", pq), qs, pq, topK = 5)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(full == fullWant)
  }

  test("probe prunes unprobed cell directories via a static partition filter") {
    val emb = Tables.embeddings(spark, sfDir)
    val ivf = IvfIndex.train(emb, "embedding", k = 8, maxIter = 5)
    val pq = PqIndex.train(emb, "embedding", m = 8, k = 16, maxIter = 5)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-prune").toString
    IvfPq.build(emb, "vec_id", "embedding", path, ivf, pq)
    // 2 queries × nProbe 2 ≤ 4 < 8 cells: some cell dir MUST be skipped.
    val res = IvfPq.search(spark, path, queriesOf(emb, 2), k = 5, nProbe = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[cell.* IN \\(([^)]*)\\)".r.findFirstMatchIn(plan)
    assert(pf.isDefined, s"no static cell IN partition filter on the codes scan:\n$plan")
    val probed = pf.get.group(1).split(",").length
    assert(probed > 0 && probed <= 4,
      s"expected ≤ 2 queries × 2 probe cells in the partition filter, got $probed")
  }

  test("append with the saved models == fresh build over the union") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.filter(col("vec_id") % 4 =!= 0)
    val b = emb.filter(col("vec_id") % 4 === 0)
    val ivf = IvfIndex.train(a, "embedding", k = 8, maxIter = 5)
    val pq = PqIndex.train(a, "embedding", m = 8, k = 16, maxIter = 5)
    val p1 = java.nio.file.Files.createTempDirectory("ivfpq-app").toString
    IvfPq.build(a, "vec_id", "embedding", p1, ivf, pq)
    IvfPq.append(b, "vec_id", "embedding", p1)
    val p2 = java.nio.file.Files.createTempDirectory("ivfpq-union").toString
    IvfPq.build(emb, "vec_id", "embedding", p2, ivf, pq)
    val qs = queriesOf(emb, 3)
    def run(p: String) = IvfPq.search(spark, p, qs, k = 5, nProbe = 3)
      .select("query_id", "id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(run(p1) == run(p2))
  }

  test("quality gate: persisted IVFxPQ recall@10 vs exact L2 clears the floor") {
    // The oracled x_recall_ivfpq measures the retrieval shape with
    // portable quantizers; THIS pins the deployed artifact — MLlib-
    // trained IVF + PQ, persisted layout, nProbe probing — to a recall
    // floor against the exact L2 top-10 over the same probes (L2 is the
    // metric the ADC chain approximates — PqIndexSpec's own floor is
    // likewise vs exact L2). The floor (0.15 mean recall@10 at nProbe=6
    // of 8 cells, 32x compression, unnormalized random vectors — a
    // worst case for PQ) is what a rollout would alert on: measured mean
    // is ~0.23 here, ~11x the 0.02 chance level of a random top-10 from
    // the candidate pool, and a broken ADC chain or codebook mix-up
    // lands at chance. Exactness at nProbe=k stays pinned by the
    // build/append tests above.
    val emb = Tables.embeddings(spark, sfDir)
    val ivf = IvfIndex.train(emb, "embedding", k = 8, maxIter = 5)
    val pq = PqIndex.train(emb, "embedding", m = 8, k = 16, maxIter = 5)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-recall").toString
    IvfPq.build(emb, "vec_id", "embedding", path, ivf, pq)
    val qs = queriesOf(emb, 10)
    val ann = IvfPq.search(spark, path, qs, k = 10, nProbe = 6)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Exact L2 top-10, driver-side over the collected corpus (500 rows).
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val exact = qs.map { case (qid, q) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v) =>
          (v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    val recalls = exact.map { case (q, want) =>
      ann.getOrElse(q, Set.empty).intersect(want).size / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(recalls.size == 10)
    assert(mean >= 0.15,
      f"IVFxPQ mean recall@10 $mean%.2f below 0.15 floor (per-probe: " +
        recalls.map(r => f"$r%.1f").mkString(",") + ")")
  }
}
