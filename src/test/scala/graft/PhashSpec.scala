package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{defaultBands, wideBands, BandGeometry}

class PhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ph(id: Long): Long =
    Multimodal.pHash(Multimodal.synthPatternPng(id)).get

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("brightness-only variants are Hamming-near-zero; bytes still differ") {
    // ids 0 and 3: same scene, different base brightness — a pure DC
    // shift, but Java2D's bilinear rescale rounds integer pixels, so a
    // few near-median bits may jitter. ≤ 6 is the measured envelope.
    assert(hamming(ph(0L), ph(3L)) <= 6)
    assert(!java.util.Arrays.equals(
      Multimodal.synthPatternPng(0L), Multimodal.synthPatternPng(3L)))
  }

  test("patch variants are Hamming-near; other scenes are far") {
    // ids 0 and 7: same scene, one 8×8 patch brightened.
    assert(hamming(ph(0L), ph(7L)) <= 10)
    // Different scenes should not sit within the near-dup threshold.
    val far = for (s <- 1L to 5L) yield hamming(ph(0L), ph(s * 10L))
    assert(far.forall(_ > 10), s"cross-scene distances too small: $far")
  }

  test("phashPairs finds every same-scene pair and no cross-scene pair") {
    val ids = (0L until 30L) // 3 scenes × 10 variants
    val media = ids.map(id => (id, Multimodal.synthPatternPng(id))).toDF("doc_id", "media")
    val pairs = Multimodal.phashPairs(media, "doc_id", "media", maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sameScene = for {
      a <- ids; b <- ids if a < b && a / 10 == b / 10
    } yield (a, b)
    assert(sameScene.toSet.subsetOf(pairs), "missed planted near-dups")
    assert(pairs.forall { case (a, b) => a / 10 == b / 10 },
      s"cross-scene false positives: ${pairs.filterNot { case (a, b) => a / 10 == b / 10 }}")
  }

  test("band geometry: windows, cover, and the guaranteed-Hamming bound") {
    // Default 16×12-bit step-4 geometry: each bit in 3 windows → ≤5
    // flips guaranteed; wide 8×16-bit step-8: each bit in 2 → ≤3.
    assert(defaultBands.step == 4 && defaultBands.cover == 3 &&
      defaultBands.guaranteedHamming == 5)
    assert(wideBands.step == 8 && wideBands.cover == 2 &&
      wideBands.guaranteedHamming == 3)
    // Pin the key function itself on a recognizable bit pattern (wide
    // geometry keeps the historical 8-offset byte-rotation keys).
    val x = 0x0123456789abcdefL
    assert((0 until 8).map(wideBands.key(x, _)) ==
      Seq(0xcdefL, 0xabcdL, 0x89abL, 0x6789L, 0x4567L, 0x2345L, 0x0123L, 0xef01L))
    assert(defaultBands.key(x, 0) == (x & 0xfffL))
    assert(defaultBands.key(x, 1) == ((x >>> 4) & 0xfffL))
    // Pigeonhole: any ≤guaranteedHamming flips always leave one clean
    // window. Randomized over flip placements for both geometries.
    val rnd = new scala.util.Random(7)
    for (g <- Seq(defaultBands, wideBands); _ <- 1 to 200) {
      val base = rnd.nextLong()
      val flips = Seq.fill(g.guaranteedHamming)(rnd.nextInt(64)).distinct
      val other = flips.foldLeft(base)((h, i) => h ^ (1L << i))
      assert((0 until g.windows).exists(b => g.key(base, b) == g.key(other, b)),
        s"no clean band for flips=$flips under $g")
    }
  }

  test("column band-key expression agrees bit-for-bit with the JVM twin") {
    val rnd = new scala.util.Random(11)
    // Include sign-bit-set and edge values: the wrapping shift must be
    // exact for negative longs and at offset 0.
    val hs = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 0x0123456789abcdefL) ++
      Seq.fill(50)(rnd.nextLong())
    val df = hs.toDF("ph")
    for (g <- Seq(defaultBands, wideBands)) {
      val cols = (0 until g.windows).map(b => g.keyCol(col("ph"), b))
      val got = df.select(col("ph") +: cols: _*).collect()
      got.foreach { r =>
        val phv = r.getLong(0)
        for (b <- 0 until g.windows)
          assert(r.getLong(1 + b) == g.key(phv, b),
            s"column/JVM band-key mismatch at ph=$phv b=$b under $g")
      }
    }
  }

  test("simulated recall floors for d flips past the guarantee (default geometry)") {
    // The scaladoc advertises ~0.997 at d=6, ~0.94 at d=8, ~0.79 at
    // d=10 for RANDOM flip placements; pin conservative floors so a
    // geometry regression is caught.
    val rnd = new scala.util.Random(13)
    def cleanRate(d: Int, trials: Int = 2000): Double = {
      var ok = 0
      for (_ <- 1 to trials) {
        val base = rnd.nextLong()
        val flips = rnd.shuffle((0 until 64).toList).take(d)
        val other = flips.foldLeft(base)((h, i) => h ^ (1L << i))
        if ((0 until defaultBands.windows).exists(b =>
          defaultBands.key(base, b) == defaultBands.key(other, b))) ok += 1
      }
      ok.toDouble / trials
    }
    assert(cleanRate(6) >= 0.98)
    assert(cleanRate(8) >= 0.90)
    assert(cleanRate(10) >= 0.74)
  }

  test("exact-duplicate floods emit star pairs; banded path ignores them") {
    // Flood: ids 0..4 carry the SAME image bytes (a constant image at
    // corpus scale) — identical pHash. With maxBucket = 4 the group of
    // 5 is over the cap, so it contracts to STAR pairs against the
    // min-id representative (components preserved; pre-r7 these
    // vanished entirely), while scene 1, planted at 3 variants, stays
    // under the cap and still pairs up fully.
    val flood = (0L until 5L).map(id => (id, Multimodal.synthPatternPng(0L)))
    val scene = Seq(10L, 11L, 12L).map(id => (id, Multimodal.synthPatternPng(id)))
    val media = (flood ++ scene).toDF("doc_id", "media")
    val pairs = Multimodal.phashPairs(media, "doc_id", "media",
        maxHamming = 10, maxBucket = 4)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val starEdges = (1L until 5L).map(i => (0L, i, 0L)).toSet
    val scenePairs = pairs.filter { case (a, _, _) => a >= 10L }
    assert(pairs.filter(_._1 < 10L) == starEdges,
      s"flood group must contract to star edges, got: ${pairs.filter(_._1 < 10L)}")
    assert(scenePairs.map(p => (p._1, p._2)) ==
      Set((10L, 11L), (10L, 12L), (11L, 12L)),
      s"under-cap scene pairs missing: $scenePairs")
  }

  test("occupancy property: heavy-tailed corpus stays bounded, planted recall holds") {
    // 4k+ synthetic hashes: one exact-dup flood far over maxBucket, 20
    // Zipf-sized near-dup clusters (members ≤5 flips from the center —
    // inside the guarantee), and random background. Asserts the three
    // contracts at once: (1) flood contracts to exactly size-1 star
    // edges, (2) every member pairs with its cluster center, (3) total
    // output stays under the windows·U·maxBucket candidate bound — no
    // quadratic blowup from skew.
    val rnd = new scala.util.Random(17)
    val maxBucket = 200
    val floodVal = rnd.nextLong()
    val flood = (0L until 1500L).map(i => (i, floodVal))
    var nextId = 10000L
    val clusters = (0 until 20).flatMap { c =>
      val size = math.max(2, (200.0 / (c + 1)).toInt) // Zipf-ish tail
      val center = rnd.nextLong()
      val centerId = nextId; nextId += 1
      val members = (1 until size).map { _ =>
        val flips = rnd.shuffle((0 until 64).toList).take(1 + rnd.nextInt(5))
        val h = flips.foldLeft(center)((x, i) => x ^ (1L << i))
        val id = nextId; nextId += 1
        (id, h, centerId)
      }
      (centerId, center, centerId) +: members
    }
    val background = (0 until 2000).map { _ =>
      val id = nextId; nextId += 1
      (id, rnd.nextLong())
    }
    val hashed = (flood ++ clusters.map(t => (t._1, t._2)) ++ background)
      .toDF("id", "ph")
    val pairs = Multimodal.phashPairsFromHashes(hashed,
        maxHamming = 10, maxBucket = maxBucket)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    // (1) flood: exactly the 1499 star edges at hamming 0 (no member
    // of the flood appears in any other flood pair).
    val floodPairs = pairs.filter(p => p._1 < 10000L && p._2 < 10000L)
    assert(floodPairs.length == 1499 && floodPairs.forall(p => p._1 == 0L && p._3 == 0L),
      s"flood must contract to 1499 star edges, got ${floodPairs.length}")
    // (2) planted recall: every cluster member within the ≤5-flip
    // guarantee is paired with its center.
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    val missing = clusters.filter(t => t._1 != t._3).filterNot { case (id, _, cid) =>
      pairSet.contains((math.min(id, cid), math.max(id, cid)))
    }
    assert(missing.isEmpty, s"guaranteed member-center pairs missed: ${missing.take(5)}")
    // (3) the skew bound: U distinct hashes, ≤ windows·U·maxBucket
    // candidates regardless of distribution (plus the linear exact
    // path). Output is a subset of candidates.
    val u = hashed.select("ph").distinct().count()
    assert(pairs.length <= defaultBands.windows * u * maxBucket + hashed.count(),
      s"pair count ${pairs.length} exceeds the occupancy bound")
  }

  test("pHash is None for undecodable bytes and deterministic for valid ones") {
    assert(Multimodal.pHash("not a png".getBytes).isEmpty)
    assert(Multimodal.pHash(Array.emptyByteArray).isEmpty)
    assert(ph(42L) == ph(42L))
  }
}
