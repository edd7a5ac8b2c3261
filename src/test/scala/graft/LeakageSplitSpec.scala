package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupResolve, TextDedup}

/** Pins the property that makes `x_leakage_split_fast` safe: the PPJoin
  * prefix-filter CANDIDATE edge set is a deterministic superset of the
  * exact Jaccard ≥ t edge set, so the candidate-edge split's groups are
  * a COARSENING of the exact split's groups — two true near-duplicates
  * can never land on opposite sides of the fast split.
  */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  import spark.implicits._

  // ~60 docs: 10 near-dup families (one-token edits of a 24-token base —
  // word-3-gram Jaccard well above 0.8 within a family) + unique
  // background docs that share common words but not 3-grams densely.
  private lazy val docs = {
    val rnd = new scala.util.Random(23)
    def sentence(seed: Int, n: Int = 24): Seq[String] =
      (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}_$i")
    val families = (0 until 10).flatMap { f =>
      val base = sentence(f)
      val variants = (0 until 3).map { v =>
        val t = base.toArray
        if (v > 0) t(rnd.nextInt(t.length)) = s"edit_${f}_$v"
        (f * 10L + v, t.mkString(" "))
      }
      variants
    }
    val background = (0 until 30).map { i =>
      (1000L + i, sentence(100 + i * 13).mkString(" "))
    }
    (families ++ background).toDF("doc_id", "text")
  }

  private def split(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    DedupResolve.connectedComponents(edges.select(col("id_a"), col("id_b")))
      .withColumnRenamed("id", "doc_id")
      .as[(Long, Long)].collect().toMap

  test("candidate edges are a superset of the exact Jaccard edges") {
    val exact = TextDedup.ngramJaccardJoin(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cands = TextDedup.ppjoinCandidates(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus must plant exact near-dup pairs")
    assert(exact.subsetOf(cands),
      s"prefix-filter candidates lost exact pairs: ${(exact -- cands).take(5)}")
  }

  test("exact split groups refine into candidate split groups (no cross-side leaks)") {
    val exactLabels = split(
      TextDedup.ngramJaccardJoin(docs, "doc_id", "text", threshold = 0.8))
    val candLabels = split(
      TextDedup.ppjoinCandidates(docs, "doc_id", "text", threshold = 0.8))
    // Refinement: same exact component ⇒ same candidate component. The
    // fast split buckets by candidate component label, so this is
    // exactly "no two near-duplicates on opposite sides".
    val byExact = exactLabels.groupBy(_._2).values
    for (grp <- byExact) {
      val candGrps = grp.keys.map(id => candLabels.getOrElse(id, id)).toSet
      assert(candGrps.size == 1,
        s"exact component ${grp.keys.toSeq.sorted} splits across candidate components $candGrps")
    }
  }

  test("family members always share a side under the fast split") {
    val result = SparkEntry.queries("x_leakage_split_fast")(spark, sfDir)
    val sides = result.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sides.values.toSet.subsetOf(Set("train", "heldout")))
    // Replay the exact near-dup pairs over the driver table and assert
    // side agreement pair-by-pair — the integrity contract itself.
    val d = graft.sources.Tables.documents(spark, sfDir)
    val exact = TextDedup.ngramJaccardJoin(d, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    exact.foreach { case (a, b) =>
      assert(sides(a) == sides(b), s"near-dups $a,$b split across sides")
    }
  }
}
