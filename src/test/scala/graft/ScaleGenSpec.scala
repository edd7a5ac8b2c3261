package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the invariants the sf1.0 scale dataset rests on: replicas are
  * key-disjoint copies of the star schema (join cardinality preserved),
  * dims stay fixed, names re-derive from shifted keys (no duplicate-name
  * block inflation), and replica content decorrelates without touching
  * within-replica structure.
  */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val outDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft-scalegen").toString
    ScaleGen.run(spark, "/root/testdata/sf0.001", out, 2)
    out
  }

  private def t(name: String) = spark.read.parquet(s"$outDir/$name.parquet")
  private def src(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")

  test("facts double with disjoint keys; dims stay fixed") {
    for ((tbl, key) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "lineitem" -> "l_orderkey", "events" -> "event_id",
        "documents" -> "doc_id", "embeddings" -> "vec_id")) {
      assert(t(tbl).count() == 2 * src(tbl).count(), s"$tbl row count")
      // Keys disjoint across replicas: distinct count doubles too
      // (lineitem's key is the order FK — distinct doubles, not rows).
      assert(t(tbl).select(key).distinct().count() ==
        2 * src(tbl).select(key).distinct().count(), s"$tbl key disjointness")
    }
    assert(t("region").count() == src("region").count())
    assert(t("nation").count() == src("nation").count())
  }

  test("referential integrity: no orphan lineitems or orders") {
    val orphans = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0)
    val custOrphans = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(custOrphans == 0)
  }

  test("names re-derive from shifted keys — never duplicated across replicas") {
    assert(t("customer").select("c_name").distinct().count() == t("customer").count())
    assert(t("supplier").select("s_name").distinct().count() == t("supplier").count())
    // and keep the source's format so prefix-blocked operators see the
    // same shape: Customer#<9 digits>.
    val bad = t("customer")
      .filter(!col("c_name").rlike("^Customer#[0-9]{9}$")).count()
    assert(bad == 0)
  }

  test("replica text decorrelates across replicas, is identical within replica 0") {
    val docB = src("documents").agg(max("doc_id")).collect()(0).getLong(0) + 1
    val r0 = t("documents").filter(col("doc_id") < docB)
      .select(col("doc_id"), col("text").as("t0"))
    // Replica 0 is bit-identical to the source.
    val diff0 = r0.join(src("documents").select(col("doc_id"), col("text")),
        Seq("doc_id"))
      .filter(col("t0") =!= col("text")).count()
    assert(diff0 == 0)
    // Replica 1 of the same doc differs for any doc with a perturbable
    // word (~20% of vocabulary carries the suffix), and the perturbation
    // is a vocabulary map: token counts per doc are preserved.
    val r1 = t("documents").filter(col("doc_id") >= docB)
      .select((col("doc_id") - docB).as("doc_id"), col("text").as("t1"))
    val joined = r0.join(r1, Seq("doc_id"))
    val same = joined.filter(col("t0") === col("t1")).count()
    assert(same < joined.count(), "replica 1 must not be a verbatim copy")
    val badTok = joined.filter(
      size(split(col("t0"), " ")) =!= size(split(col("t1"), " "))).count()
    assert(badTok == 0, "perturbation must preserve token counts")
  }

  test("embedding rotation preserves within-replica dot products exactly") {
    val vecB = src("embeddings").agg(max("vec_id")).collect()(0).getLong(0) + 1
    val e = t("embeddings")
    def dots(lo: Long, hi: Long, shift: Long) = e
      .filter(col("vec_id") >= lo && col("vec_id") < lo + 50)
      .select((col("vec_id") - shift).as("k"), col("embedding")).as("a")
      .join(e.filter(col("vec_id") >= lo && col("vec_id") < lo + 50)
        .select((col("vec_id") - shift).as("k2"), col("embedding").as("e2")).as("b"),
        col("k") === col("k2") - 1)
      .select(col("k"), aggregate(zip_with(col("embedding"), col("e2"),
        (x, y) => x * y), lit(0.0d), (acc, v) => acc + v).as("dot"))
    val d0 = dots(0, vecB, 0).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d1 = dots(vecB, 2 * vecB, vecB).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d0.keySet == d1.keySet && d0.keySet.nonEmpty)
    d0.foreach { case (k, v) =>
      assert(math.abs(d1(k) - v) <= 1e-6 * math.max(1.0, math.abs(v)),
        s"rotation must preserve pairwise dot products: $k $v vs ${d1(k)}")
    }
  }

  test("embedding transform survives factor > dim: orthogonal + distinct per replica") {
    import spark.implicits._
    // dim = 4, replicas 0, 1, dim (rotation wraps to 0), dim+1 (same
    // rotation as 1): the transform must stay length-preserving, keep
    // pairwise dot products within each replica, and never make two
    // replicas identical — the r=64 underflow/copy bug at factor 100.
    val dim = 4
    val vecs = Seq(Seq(1.0, 2.0, -3.0, 0.5), Seq(0.25, -1.0, 4.0, 2.0))
    val rows = for (r <- Seq(0, 1, dim, dim + 1); (v, i) <- vecs.zipWithIndex)
      yield (r, i, v)
    val out = rows.toDF("r", "i", "embedding")
      .withColumn("t", ScaleGen.embeddingTransform(col("embedding"), col("r")))
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getSeq[Double](3))
      .toMap
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    val want = dot(vecs(0), vecs(1))
    for (r <- Seq(0, 1, dim, dim + 1)) {
      assert(math.abs(dot(out((r, 0)), out((r, 1))) - want) < 1e-12,
        s"replica $r must preserve within-replica dot products")
      assert(math.abs(dot(out((r, 0)), out((r, 0))) - dot(vecs(0), vecs(0))) < 1e-12)
    }
    assert(out((0, 0)) == vecs(0), "r=0 is the untouched source")
    val images = Seq(0, 1, dim, dim + 1).map(r => out((r, 0)))
    assert(images.distinct.size == images.size,
      "no two replicas may produce identical embeddings (r ≡ r' mod dim included)")
  }
}
