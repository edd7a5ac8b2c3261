package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

class GraphsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("u", "v")

  test("K4 has exactly 4 triangles, each node supporting 3") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(Graphs.triangles(k4).count() == 4L)
    val support = Graphs.triangleSupport(k4)
      .as[(Long, Long)].collect().toMap
    assert(support == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a path graph is triangle-free but every node still reports") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val support = Graphs.triangleSupport(path).as[(Long, Long)].collect().toMap
    assert(support == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("each triangle is emitted exactly once (no orientation double-count)") {
    // Two triangles sharing the edge (2,3).
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tris = Graphs.triangles(g).as[(Long, Long, Long)].collect().toSet
    assert(tris.size == 2)
    assert(Graphs.triangles(g).count() == 2L) // no duplicates pre-distinct
  }

  test("peel removes a star's leaves at k=2 and fixes the core") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
    // deg: 1→3, 2→2, 3→2, 4→1. k=2 drops node 4 and its edge.
    val once = Graphs.peel(star, 2).as[(Long, Long)].collect().toSet
    assert(once == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // The surviving triangle is a fixed point of further peeling.
    assert(Graphs.peel(Graphs.peel(star, 2), 2).count() == 3L)
    // The loop-owned variant (dead rounds freed eagerly, default
    // storage level) is the same operator: kcore(e, k, n) == n nested
    // peels.
    assert(Graphs.kcore(star, 2, 2).as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(Graphs.kcore(star, 2, 3).count() == 3L)
  }

  test("cooccurrenceEdges builds the canonical pair set") {
    val m = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 2L), (11L, 3L), (12L, 5L))
      .toDF("g", "m")
    val e = Graphs.cooccurrenceEdges(m, "g", "m").as[(Long, Long)].collect().toSet
    assert(e == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("cooccurrenceEdges dedups repeated (group, member) rows and " +
      "singleton/empty groups emit nothing") {
    // (10, 2) repeated — collect_set must absorb it like the old
    // distinct did; group 12 is a singleton, group 13 all-duplicates.
    val m = Seq((10L, 1L), (10L, 2L), (10L, 2L), (11L, 2L), (12L, 5L),
      (13L, 7L), (13L, 7L)).toDF("g", "m")
    val e = Graphs.cooccurrenceEdges(m, "g", "m").as[(Long, Long)].collect().toSet
    assert(e == Set((1L, 2L)))
  }

  test("cooccurrenceWeightedEdges weights = shared-group counts, " +
      "and equals the naive distinct+self-join+groupBy plan") {
    val m = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 2L), // dup (11,2) must not inflate w
      (12L, 2L), (12L, 3L), (13L, 9L)).toDF("g", "m")
    val got = Graphs.cooccurrenceWeightedEdges(m, "g", "m")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 2L)))
    // Reference plan (the pre-r12 shape).
    val d = m.distinct()
    val ref = d.as("a").join(d.as("b"),
        $"a.g" === $"b.g" && $"a.m" < $"b.m")
      .groupBy($"a.m".as("u"), $"b.m".as("v"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("w"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("labelPropagate carries the min id exactly graph-distance rounds") {
    // Path 1-2-3-4-5 plus an isolated edge (10, 11).
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    def labels(r: Int): Map[Long, Long] =
      Graphs.labelPropagate(g, r).as[(Long, Long)].collect().toMap
    // After r rounds a node carries the min id within graph distance r.
    assert(labels(1) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      10L -> 10L, 11L -> 10L))
    assert(labels(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      10L -> 10L, 11L -> 10L))
    assert(labels(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L,
      10L -> 10L, 11L -> 10L))
    // The 5-path's diameter is 4: fixed point reached at r = 4.
    assert(labels(4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("labelPropagate components never merge across disconnected parts") {
    val g = edges((7L, 3L), (3L, 9L), (20L, 25L), (25L, 21L))
    val l = Graphs.labelPropagate(g, 4).as[(Long, Long)].collect().toMap
    assert(l == Map(3L -> 3L, 7L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 25L -> 20L))
  }
}
