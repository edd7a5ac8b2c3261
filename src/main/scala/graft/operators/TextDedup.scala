package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftBridge

import graft.functions.{MinhashSig, Shingles, SimHash}

/** Document-deduplication operators for training-data pipelines
  * (SURVEY.md §2.3). Scale posture: every sketch (minhash signature,
  * simhash, band keys) is computed in a single narrow projection — no
  * shuffle until the candidate join, and the candidate join is an
  * equi-join on band keys (never a cross join). At 100 TB the band join
  * shuffles only (id, band_key) pairs, and skewed buckets are bounded by
  * `maxBucket` (drop-degenerate-bucket guard, standard LSH practice).
  */
object TextDedup {

  /** Repartition to the session's shuffle-partition count with an
    * explicit N: AQE coalesces count-less repartitions of small-bytes/
    * high-CPU frames back to one or two tasks.
    */
  private def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt, key)

  /** Leak-free materialization for frames read 2+ times — see
    * [[Materialize]] for the persist-vs-localCheckpoint contract.
    */
  private def cached(df: DataFrame): DataFrame = Materialize(df)

  // ------------------------------------------------------------------
  // Exact dedup (hash-groupBy) — reference-style enforce-unique, applied
  // to document text (content hash, not key hash).
  // ------------------------------------------------------------------

  /** One row per distinct text: content hash, surviving (min) id, copy count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** C4/paragraph-style exact SPAN dedup: the corpus is cut into
    * fixed-granularity spans (`w`-word windows, the "line" unit for a
    * corpus without newlines), every repeated span keeps only its first
    * occurrence in (doc_id, position) order, and documents are
    * reassembled from their surviving spans (docs whose every span was
    * seen earlier disappear). One shuffle on the span text (the
    * first-occurrence window), one on doc_id (the reassembly groupBy);
    * span keys hash-distribute evenly, so neither stage has a skew
    * hazard at corpus scale — hot spans cap at one surviving row each.
    */
  /** (doc_id, chunk_idx, ch): the corpus cut into `w`-word spans — the
    * shared front half of batch [[spanDedup]] and the streaming twin
    * (`StreamOps.spanDedupStream`). Narrow explode, no shuffle.
    */
  def spans(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), col("t"),
        expr(s"explode(sequence(0L, (size(t) + ${w - 1}) div $w - 1))").as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"array_join(slice(t, CAST(chunk_idx * $w + 1 AS INT), $w), ' ')").as("ch"))

  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 10): DataFrame = {
    val spans0 = spans(df, idCol, textCol, w)
    val firstSeen = org.apache.spark.sql.expressions.Window
      .partitionBy("ch").orderBy("doc_id", "chunk_idx")
    spans0.withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("chunk_idx"), col("ch")))),
            x => x.getField("ch")), " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
  }

  /** Content-defined chunk dedup: like [[spanDedup]] but with
    * ROLLING-HASH boundaries ([[graft.functions.cdcChunks]]) instead of
    * fixed word windows — an insertion or deletion re-synchronizes chunk
    * cuts a few chunks downstream, so shifted copies still dedup (the
    * fixed-grid span cut shares ~nothing once content slides; spec'd).
    * First occurrence of each chunk (by document, then position) wins;
    * documents reassemble from their surviving chunks by position.
    * Same shuffle shape as spanDedup: one explode, one chunk-keyed
    * window, one per-doc agg.
    */
  def cdcDedup(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, maskBits: Int = 5, minLen: Int = 32,
      maxLen: Int = 128): DataFrame = {
    val chunks = df.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.cdcChunks(
          col(textCol), window, maskBits, minLen, maxLen))
          .as(Seq("chunk_idx", "ch")))
    val firstSeen = org.apache.spark.sql.expressions.Window
      .partitionBy("ch").orderBy("doc_id", "chunk_idx")
    chunks.withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("chunk_idx"), col("ch")))),
            x => x.getField("ch")), "").as("text_clean"),
        count(lit(1)).as("n_kept"))
  }

  /** Exact SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", the ExactSubstr tier): any run
    * of ≥ `minTokens` consecutive tokens that occurs more than once in
    * the corpus keeps only its globally-first occurrence (by (doc_id,
    * token position)); every other occurrence is cut out of its
    * document. Complements [[spanDedup]] (fixed grid — a shifted copy
    * shares no spans) and [[cdcDedup]] (content-defined boundaries —
    * re-syncs, but at chunk granularity): this contract is positional
    * and exact at TOKEN granularity, the strongest of the three.
    *
    * Mechanics: a repeated run of length ≥ L contains a repeated
    * L-window at every offset, so flagging every L-window with corpus
    * frequency ≥ 2 and deleting all its occurrences except the first
    * marks exactly the non-first occurrences of every maximal repeated
    * run. Marked windows merge into disjoint per-doc spans (running-max
    * islands), and documents reassemble from their unmarked tokens.
    *
    * Scale shape (100 TB posture): window generation is one native
    * expression + posexplode (no token-array carried through Generate —
    * rows are (doc_id, pos, gram) only). First-occurrence is a groupBy
    * on the gram with `min(struct(doc, pos))` + count — PARTIAL-
    * aggregable, so a boilerplate gram repeated 10M times combines
    * map-side instead of sorting one hot key (why not a row_number
    * window, which must sort every occurrence of the hottest gram in
    * one partition). Deleted-occurrence discovery is an equi-join on
    * the gram (skew-safe: the flagged side is one row per gram); spans
    * and reassembly shuffle by doc_id once (window + two groupBys share
    * the partitioning). Everything downstream of the explode carries
    * fixed-width rows except the gram itself; production keying can
    * swap the gram for xxhash64(gram) (8 B, collision-negligible at
    * 2⁻⁶⁴) — the oracled contract keys on the string so DuckDB replays
    * equality exactly.
    *
    * The window frame `wins` is deliberately NOT materialized although
    * two consumers read it (the flag agg and the probe join): its gram
    * rows are ~25× the corpus text, so checkpointing trades a narrow
    * scan+explode recompute for corpus×25 storage traffic — the wrong
    * side of the bargain at 100 TB. At modest SF the planner broadcasts
    * the flagged side anyway, so the probe branch pays no shuffle at
    * all (plan read at sf0.001); measured 0.73× linear at the sf100
    * probe with the recompute in place. (Contrast [[SubstrIndex
    * .dedupBatch]], where the BATCH's windows ARE materialized — three
    * consumers and the batch is small beside the standing corpus.)
    *
    * Returns (doc_id, text_clean, n_dropped) for EVERY input doc —
    * untouched docs pass through whole, fully-duplicated docs come back
    * with empty text_clean and n_dropped = token count.
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 8): DataFrame = {
    val L = minTokens
    val wins = df.select(col(idCol).as("doc_id"),
        posexplode(GraftBridge.column(
          graft.functions.SubstrWindows(GraftBridge.expression(col(textCol)), L)))
          .as(Seq("pos", "gram")))
    val flagged = wins.groupBy("gram")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("gram"), col("first.doc_id").as("fdoc"),
        col("first.pos").as("fpos"))
    val deleted = wins.join(flagged, "gram")
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
      .select(col("doc_id"), col("pos").cast("long").as("s"),
        (col("pos") + L - 1).cast("long").as("e"))
    cutDeleted(df, idCol, textCol, deleted)
  }

  /** Shared tail of [[substringDedup]] and [[SubstrIndex.dedupBatch]]:
    * merge marked windows `(doc_id, s, e)` into disjoint per-doc spans
    * (running-max islands — adjacent spans fuse too; membership is what
    * matters downstream) and reassemble every input doc from its
    * unmarked tokens.
    */
  private[operators] def cutDeleted(df: DataFrame, idCol: String,
      textCol: String, deleted: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    val spans = deleted
      .withColumn("pmax", max(col("e")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax") + 1, 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept", when(col("spans").isNull, col("t"))
        .otherwise(expr(
          "filter(t, (x, i) -> NOT exists(spans, sp -> i >= sp.s AND i <= sp.e))")))
      .select(col("doc_id"), array_join(col("kept"), " ").as("text_clean"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_dropped"))
  }

  // ------------------------------------------------------------------
  // Shingling helpers (narrow, codegen'd — no UDFs)
  // ------------------------------------------------------------------

  /** Distinct word n-gram shingles of normalized text (native expression —
    * the HOF (`transform`+`slice`) formulation re-evaluates the tokenizer
    * per element in the interpreted lambda path, O(tokens²)).
    */
  def wordShingles(text: Column, n: Int): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(text), n, word = true))

  /** Distinct character n-gram shingles of normalized text. */
  def charShingles(text: Column, n: Int): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(text), n, word = false))

  /** MinHash signature column of a shingle-array column. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinhashSig(GraftBridge.expression(shingles), numHashes))

  /** Items with (estimated) frequency > maxDf via one SpaceSaving pass —
    * the constant-shuffle alternative to an exact `groupBy(item).count`
    * for skew-guard cuts. Two contracts, chosen by `provableOnly`:
    *
    *  - `provableOnly = false` (default, the legacy soundness contract):
    *    filter on count_hi (the sketch's UPPER bound), so every item
    *    truly above maxDf is returned (possibly plus near-hot false
    *    positives); `capacity` must be ≥ totalRows/maxDf for that
    *    guarantee (standard SpaceSaving: any item with count >
    *    N/capacity is tracked). Right when over-cutting is acceptable
    *    and under-cutting is not (pure-sketch skew guards).
    *  - `provableOnly = true`: filter on count_lo (= count_hi − err, a
    *    LOWER bound on true df), so every returned item PROVABLY has
    *    df > maxDf — zero false positives at any capacity. Required by
    *    the two-level cut: a count_hi cut at starved capacity removes
    *    shingles whose true df ≤ maxDf (count_hi overestimates once the
    *    sketch evicts), and the exact residual count can never restore
    *    an anti-joined row — breaking the "exact-cut semantics at ANY
    *    capacity" claim (r9 ADVICE). Items missed here still have
    *    df ≤ maxDf + err ≤ maxDf + N/capacity, so the residual exact
    *    count stays skew-free.
    *
    * The result is driver-sized by construction: ≤ capacity entries.
    */
  def hotItemsSketch(df: DataFrame, item: Column, maxDf: Long,
      capacity: Int, provableOnly: Boolean = false): Array[String] = {
    val bound = if (provableOnly) col("e.count_lo") else col("e.count_hi")
    val summary = df.agg(graft.functions.heavyHitters(item, capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .filter(bound > maxDf)
      .select(col("e.item"))
    summary.collect().map(_.getString(0))
  }

  // ------------------------------------------------------------------
  // N-gram Jaccard set-similarity join
  // ------------------------------------------------------------------

  /** Top-k most similar pairs by exact Jaccard over word n-grams.
    * Posting-list set-similarity join: ONE shuffle groups the inverted
    * index by shingle; candidate pairs are generated inside each posting
    * list (id-sorted combinations, so id_a < id_b holds by construction)
    * and re-aggregated to |A∩B| → |A∩B| / (|A|+|B|−|A∩B|). The n² pair
    * space is never materialized across partitions — only within posting
    * lists already bounded by the df-cut.
    *
    * Stop-shingle cut: shingles present in > maxDf docs carry no
    * discrimination and would make posting lists quadratic (the df-cut
    * analog of PPJoin prefix filtering). Jaccard from the surviving
    * shingles is a lower bound; exact when nothing is cut.
    *
    * The cut happens BEFORE the posting lists are collected: df is a
    * count agg, the (small, ≤ Σdf/maxDf entries) hot-shingle set is
    * anti-joined against the exploded frame, and collect_set only ever
    * sees surviving rows — a stop-shingle never materializes an
    * unbounded array in one aggregation buffer. Both the df agg and the
    * anti-join shuffle on `shingle`, so the exchange is planned once and
    * reused; AQE broadcasts the hot set when it is small.
    *
    * `sketchCapacity > 0` switches the hot-set detection to the
    * SpaceSaving heavy-hitters sketch ([[graft.functions.SpaceSavingAgg]]):
    * one constant-size summary per partition instead of a
    * distinct-shingle-sized partial-agg shuffle, and the cut becomes a
    * driver-broadcast literal predicate (NOT-isin) — the posting build
    * then plans exactly one exchange. The sketch cuts only PROVABLE
    * heavy hitters (count_lo > maxDf — zero false positives at any
    * capacity), and an exact residual df count over the bounded
    * survivors (df ≤ maxDf + N/capacity) applies the real maxDf cut —
    * so the result is identical to the count-agg path at ANY capacity
    * (spec-asserted at starved capacity), with the sketch as the skew
    * guard that keeps giant postings out of the residual count.
    */
  def ngramJaccardTopK(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 20, maxDf: Int = 200,
      sketchCapacity: Int = 0): DataFrame =
    sharedShingleCounts(df, idCol, textCol, n, maxDf, sketchCapacity)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")))
      .select("id_a", "id_b", "jaccard")
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)

  /** Top-k pairs by the OVERLAP COEFFICIENT |A∩B| / min(|A|,|B|) —
    * asymmetric containment: a short document quoted or wholly embedded
    * in a longer one scores ~1 here while its Jaccard stays low (the
    * union is dominated by the longer doc). The standard screen for
    * quote/subset duplicates that symmetric Jaccard misses. Same
    * posting-list join and df-cut as [[ngramJaccardTopK]] — only the
    * scoring differs, so the shuffle shape (and the 100 TB posture) is
    * identical.
    */
  def ngramContainmentTopK(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 20, maxDf: Int = 200): DataFrame =
    sharedShingleCounts(df, idCol, textCol, n, maxDf, sketchCapacity = 0)
      .withColumn("containment",
        col("shared").cast("double") / least(col("sz_a"), col("sz_b")))
      .select("id_a", "id_b", "containment")
      .orderBy(col("containment").desc, col("id_a"), col("id_b"))
      .limit(k)

  /** Shared pipeline of the set-similarity joins: shingle → df-cut →
    * posting lists → in-list pair combos → per-pair shared counts with
    * both set sizes. Returns (id_a, id_b, shared, sz_a, sz_b).
    */
  private def sharedShingleCounts(df: DataFrame, idCol: String,
      textCol: String, n: Int, maxDf: Int, sketchCapacity: Int): DataFrame = {
    // Shingling runs once: lineage-free cached blocks (see `cached`) feed
    // the df agg and the posting-list build. Explicit repartition by id:
    // the documents scan is a handful of maxPartitionBytes splits (ONE at
    // sf10), and every downstream consumer of the cached blocks — the
    // sketch scan, the explode, the partial aggregations BELOW the next
    // exchange — inherits that width (the r9 tiny-projection→heavy-
    // compute lesson, applied to the shingle family).
    val nPart =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sets = cached(
      df.repartition(nPart, col(idCol))
        .select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
        .withColumn("sz", size(col("sh"))))
    // Shingles are distinct per doc, so count == document frequency.
    val postings =
      if (sketchCapacity > 0) {
        // provableOnly: the level-1 cut must have ZERO false positives —
        // a count_hi cut at starved capacity removes shingles with true
        // df ≤ maxDf that the residual count can't restore (r9 ADVICE).
        val hot = hotItemsSketch(
          sets.select(explode(col("sh")).as("shingle")), col("shingle"),
          maxDf, sketchCapacity, provableOnly = true)
        // Broadcast ANTI-JOIN, not a literal NOT-isin: the hot set is
        // bounded by `capacity`, and at corpus scale it FILLS (65k items
        // at sf1) — a 65k-child In literal makes every analyzer/optimizer
        // pass walk a megabyte expression tree (463 → 295 s at sf1; the
        // rest of that regression was the sketch's O(capacity) eviction
        // scan, fixed in SpaceSavingAgg — 11.6 s with both). The join
        // build side is the same driver array, shipped once.
        //
        // ONE-PASS residual (r10, supersedes the r9 two-level shape):
        // the level-1 cut guarantees every surviving shingle has df ≤
        // maxDf + N/capacity (~7.1k at sf100 → a ≤114 KB collect_set
        // buffer — bounded, so the posting build is skew-safe without a
        // prior count), and |docs| == exact residual df. The residual
        // count and the posting build therefore FUSE into one
        // aggregation with a size filter: same exact-cut semantics (the
        // oracle hash-matches at any capacity), minus the full-frame
        // localCheckpoint materialization, a groupBy-count shuffle, and
        // a second anti-join that made the r9 shape super-linear at
        // sf100 (400.9 s vs its 24.6 s sf10 floor).
        val spark = df.sparkSession
        import spark.implicits._
        val hotDf = hot.toSeq.toDF("shingle")
        val exploded =
          sets.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
        val afterSketch =
          if (hot.isEmpty) exploded
          else exploded.join(broadcast(hotDf), Seq("shingle"), "left_anti")
        // spread: keep AQE from coalescing the small-bytes/high-CPU pair
        // explode below.
        spread(
          afterSketch.groupBy("shingle")
            .agg(sort_array(collect_set(struct(col("id"), col("sz")))).as("docs"))
            .filter(size(col("docs")) >= 2 && size(col("docs")) <= maxDf),
          col("shingle"))
      } else {
        // ONE explicit shuffle on shingle feeds BOTH aggregations: the df
        // count and the posting-list collect read the same reused exchange
        // (vs letting each groupBy plan its own partial-agg shuffle of the
        // full exploded frame — measured 2.4 s → 1.65 s at sf0.1). The
        // explicit N also keeps AQE from coalescing the downstream
        // CPU-heavy pair explode. The two-pass count→cut→collect stays in
        // THIS path: with no level-1 guard, a mega-hot shingle would
        // otherwise materialize its full posting list in one aggregation
        // buffer (count partials compress; collect_set partials don't).
        val ex = spread(
          sets.select(col("id"), col("sz"), explode(col("sh")).as("shingle")),
          col("shingle"))
        val hot = ex.groupBy("shingle").agg(count(lit(1)).as("df_"))
          .filter(col("df_") > maxDf).select("shingle")
        ex.join(hot, Seq("shingle"), "left_anti")
          .groupBy("shingle")
          .agg(sort_array(collect_set(struct(col("id"), col("sz")))).as("docs"))
          .filter(size(col("docs")) >= 2)
      }
    val pairs = postings
      .select(explode(GraftBridge.column(
        graft.functions.PairCombos(GraftBridge.expression(col("docs"))))).as("p"))
    pairs
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("p.sz_a")).as("sz_a"), first(col("p.sz_b")).as("sz_b"))
  }

  /** EXACT thresholded Jaccard self-join with PPJoin-style prefix
    * filtering: under a global rarest-first shingle order, two sets with
    * Jaccard ≥ t must share a shingle inside each other's first
    * |s| − ⌈t·|s|⌉ + 1 shingles — so only prefix shingles are exploded
    * into the inverted index, and rare shingles (tiny postings lists)
    * anchor the candidates. Exact Jaccard is recomputed per candidate from
    * the full sets. Unlike the df-cut top-k variant this is exact at any
    * scale; the prefix bound is what PPJoin/AllPairs use.
    *
    * EXACT-DUPLICATE COLLAPSE (r10): the candidate test and the Jaccard
    * score are both pure functions of the two shingle SETS, so docs with
    * identical sets are interchangeable — the join runs on ONE
    * representative per identical-set group and the result is expanded
    * back afterward (intra-group pairs are Jaccard 1 by definition;
    * cross-group pairs inherit the representatives' score). The output
    * pair set is PROVABLY identical to the direct join's
    * (LeakageSplitSpec pins it on a dup-heavy corpus). This is what
    * makes the operator survive duplicate FLOODS: the r10 sf100 probe
    * (5M docs, 34 exact-dup families of 1000) disk-killed the direct
    * join twice — ~17M intra-family candidate pairs each shipping two
    * ~90-element shingle arrays through the verify join ≈ 70+ GB of
    * sort spill, with every one of those array_intersect calls a
    * foregone conclusion. Post-collapse the verify join only ever sees
    * DISTINCT sets, whose candidate volume is what the prefix filter
    * actually bounds.
    */
  def ngramJaccardJoin(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sets = cached(
      df.select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
        .withColumn("sz", size(col("sh"))))
    if (!collapseWorthwhile(sets)) {
      // SMALL-CORPUS FAST PATH (r12): skip the exact-dup collapse and
      // the member-expansion joins entirely — below [[CollapseMinDocs]]
      // with a measured-small dup-pair mass the collapse's window
      // shuffle + membership checkpoint + two expansion joins are pure
      // constant (they only pay in flood regimes the probe just ruled
      // out). Output is identical: identical non-empty sets share their
      // first prefix shingle, so the direct pipeline finds those pairs
      // with PackedJaccard == 1.0 exactly; identical EMPTY sets (the
      // one family the prefix index cannot see — no shingle to anchor
      // on) are paired explicitly, matching the collapsed path's
      // intra-group contract.
      return emptySetPairs(sets)
        .withColumn("jaccard", lit(1.0))
        .filter(lit(1.0) >= threshold)
        .unionByName(verifiedJaccardPairs(sets, threshold))
    }
    val (memb, repSets) = setCollapse(sets)
    val repPairs = verifiedJaccardPairs(repSets, threshold)
    intraGroupPairs(memb)
      .withColumn("jaccard", lit(1.0))
      .filter(lit(1.0) >= threshold)
      .unionByName(expandRepPairs(repPairs, memb, Seq("jaccard")))
  }

  /** The direct (no-collapse) verify pipeline over prepared (id, sh, sz)
    * sets: clustered PPJoin — canonical candidates and exact Jaccard both
    * computed INSIDE the prefix-anchor cluster. `private[graft]` so the
    * spec can pin collapse ≡ direct.
    *
    * CLUSTERED VERIFY (r10): the classic shape — candidate pair join,
    * global distinct, then a verify join shipping BOTH full shingle
    * arrays per pair — is pair-priced: at the sf100 probe (5M docs,
    * 124M candidates of ~52 shingles) the verify join alone is ~800 GB
    * of shuffle, and it disk-killed a 75 GB machine twice. This pipeline
    * is cluster-priced instead:
    *
    *  1. Shingles become 128-bit fingerprints (h, h2) once; df and the
    *     global rarest-first order live on the same (df, h, h2) universe,
    *     so strings never enter a shuffle (fingerprint Jaccard ==
    *     string Jaccard up to a 2^-128 cross-set collision — the same
    *     odds-class [[setCollapse]] already calls exact).
    *  2. Each doc's PREFIX entries group by anchor shingle;
    *     [[graft.functions.PrunedPairCombos]] enumerates each cluster's
    *     pairs in memory (20 B per member — no shingle payload) and
    *     prunes them with the PPJoin length AND positional filters
    *     before anything is emitted; a global groupBy then keeps each
    *     pair at its MINIMUM shared anchor — the canonical form of the
    *     old distinct. The positional filter is what tames a
    *     replica-flooded corpus: docs sharing only a common skeleton
    *     meet at deep prefix positions where the suffix bound collapses,
    *     so they never leave the cluster (raw occurrence volume 291M at
    *     sf100; survivors ≈ the true near-dup pairs).
    *  3. Pairs chunk per anchor (row_number window, 256k pairs/chunk —
    *     the skew guard for mega near-dup families); each chunk joins
    *     the fingerprint sets of JUST its member docs, and
    *     [[graft.functions.VerifyPairs]] merge-intersects the sorted
    *     arrays in memory. A doc's verify payload ships once per
    *     (anchor, chunk) it participates in — measured 42M memberships
    *     at sf100 (≈38 GB) vs 2×124M pair-side arrays (≈800 GB).
    */
  private[graft] def verifiedJaccardPairs(sets: DataFrame,
      threshold: Double,
      directMaxPairs: Long = DirectVerifyMaxPairs): DataFrame = {
    val hsets = cached(sets.select(col("id"),
      sort_array(array_distinct(transform(col("sh"), s =>
        struct(xxhash64(s).as("h"), xxhash64(lit("graft.vfy2"), s).as("h2")))))
        .as("fp"))
      .withColumn("sz", size(col("fp"))))
    val exploded = hsets.select(col("id"), col("sz"), explode(col("fp")).as("e"))
      .select(col("id"), col("sz"), col("e.h").as("h"), col("e.h2").as("h2"))
    // Global rarest-first total order: (df, h, h2). Same no-broadcast
    // rationale as ppjoinCandidatesFromSets: the df table is
    // vocabulary-sized.
    val dfTab = exploded.groupBy("h", "h2").agg(count(lit(1)).as("df_"))
    val pref = exploded.join(dfTab, Seq("h", "h2"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df_"), col("h"), col("h2"))))
          .as("sorted"),
        first(col("sz")).as("sz"))
      .select(col("id"), col("sz"),
        posexplode(slice(col("sorted"), lit(1),
          (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))
          .as(Seq("pos", "a")))
    val occ = pref
      .groupBy(col("a").as("anchor"))
      .agg(collect_list(struct(col("id"), col("sz"), col("pos"))).as("docs"))
      .select(col("anchor"), explode(GraftBridge.column(
        graft.functions.PrunedPairCombos(
          GraftBridge.expression(col("docs")), threshold))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("anchor"))
    // Canonicalization: each candidate pair survives only at its MINIMUM
    // shared anchor under the global (df, h, h2) order — the dedup the
    // old path bought with a same-volume distinct, except the anchor now
    // also keys the verify clustering below. Materialized once: the
    // chunk window plus BOTH the pair-group and membership branches read
    // it.
    val canon = cached(occ.groupBy("id_a", "id_b")
      .agg(min(col("anchor")).as("anchor"))
      .select(col("anchor.h").as("ah"), col("anchor.h2").as("ah2"),
        col("id_a"), col("id_b")))
    // ADAPTIVE CUTOVER (r11): below DirectVerifyMaxPairs candidates the
    // pair-priced verify — join each pair to its two packed fingerprint
    // arrays, one PackedJaccard scalar per pair — beats the cluster
    // path, whose ~5 extra shuffles (chunk window, pair/membership
    // aggregations, membership join) are fixed overhead that taxed
    // every small corpus (r10: d_dedup_ppjoin 1.4 → 3.4 s at sf0.1).
    // canon is already localCheckpoint-materialized, so the count is a
    // cached-scan. Scores are bit-identical on either branch
    // (PackedJaccard replicates VerifyPairs' merge-intersect and double
    // arithmetic), so oracles and consumers cannot tell them apart.
    val nCand = canon.count()
    if (sys.env.contains("GRAFT_VERIFY_DEBUG"))
      System.err.println(s"[verify-cutover] candidates=$nCand " +
        s"branch=${if (nCand <= directMaxPairs) "direct" else "cluster"}")
    if (nCand <= directMaxPairs) {
      val packed1 = hsets.select(col("id"), flatten(transform(col("fp"),
        e => array(e.getField("h"), e.getField("h2")))).as("fpl"))
      return canon
        .join(packed1.select(col("id").as("id_a"), col("fpl").as("fpl_a")),
          Seq("id_a"))
        .join(packed1.select(col("id").as("id_b"), col("fpl").as("fpl_b")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          GraftBridge.column(graft.functions.PackedJaccard(
            GraftBridge.expression(col("fpl_a")),
            GraftBridge.expression(col("fpl_b")))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
    val chunk = ((row_number().over(
        Window.partitionBy(col("ah"), col("ah2"))
          .orderBy(col("id_a"), col("id_b"))) - 1) / lit(VerifyChunkPairs))
      .cast("int").as("ck")
    val chunked = canon.withColumn("ck", chunk)
    val pairsG = chunked.groupBy("ah", "ah2", "ck")
      .agg(collect_list(struct(col("id_a"), col("id_b"))).as("pairs"))
    // Membership payloads ship as INTERLEAVED array<long> (h0,h2_0,h1,
    // h2_1,…), not array<struct<h,h2>>: Tungsten stores a struct array
    // at ~32 B/gram (8 B offset slot + 24 B struct) vs 16 B/gram flat —
    // this projection is the measured ~38 GB sf100 membership shuffle,
    // so the packing halves the verify stage's disk/network footprint.
    // Order is preserved by transform+flatten over the already-(h,h2)-
    // sorted fp, so VerifyPairs' 2-step merge-intersect sees the same
    // sequence the struct walk did. Packed BEFORE the membership join:
    // evaluated once per doc (5M rows), not once per membership (42M).
    val packed = hsets.select(col("id"), col("sz"),
      flatten(transform(col("fp"),
        e => array(e.getField("h"), e.getField("h2")))).as("fpl"))
    val docsG = chunked
      .select(col("ah"), col("ah2"), col("ck"),
        explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
      .join(packed, "id")
      .groupBy("ah", "ah2", "ck")
      .agg(collect_list(struct(col("id"), col("sz"), col("fpl"))).as("docs"))
    // spread: verify rows are few-and-fat (small bytes pre-explode, high
    // CPU) — AQE would coalesce them onto a couple of cores.
    spread(pairsG.join(docsG, Seq("ah", "ah2", "ck")), col("ah"))
      .select(explode(GraftBridge.column(graft.functions.VerifyPairs(
        GraftBridge.expression(col("pairs")),
        GraftBridge.expression(col("docs")), threshold))).as("v"))
      .select(col("v.id_a").as("id_a"), col("v.id_b").as("id_b"),
        col("v.jaccard").as("jaccard"))
  }

  /** Pairs per verify chunk: bounds one VerifyPairs task's buffer (256k
    * pair structs ≈ 4 MB plus its member docs' fingerprint arrays) so a
    * mega near-dup family spreads across tasks instead of pinning one.
    */
  private val VerifyChunkPairs = 1 << 18

  /** Candidate-count cutover between the pair-priced direct verify and
    * the cluster-priced verify. Cost model: the direct join ships each
    * doc's packed array once per PAIR (~2 × 800 B at ~50 shingles → ~1.6
    * KB/pair ≈ 1.6 GB of shuffle at the cutover — one cheap shuffle),
    * while the cluster path ships it once per (anchor, chunk) membership
    * but pays ~5 fixed shuffles. Measured r11 at sf0.1 (57k candidates →
    * direct) and held at the sf10/sf100 probes (≫ cutover → cluster
    * path, floors unchanged). `private[graft]` so specs can exercise
    * both branches deterministically.
    */
  private[graft] val DirectVerifyMaxPairs = 1L << 20

  /** PPJoin prefix-filter CANDIDATE pairs only — a DETERMINISTIC
    * SUPERSET of the Jaccard ≥ `threshold` pairs (the prefix bound is
    * sound: any two sets with Jaccard ≥ t share a shingle inside each
    * other's first |s| − ⌈t·|s|⌉ + 1 rarest shingles), WITHOUT the
    * per-pair exact-Jaccard verification. That verification (one
    * `array_intersect` per candidate) is the CPU-dominant stage of
    * [[ngramJaccardJoin]]; consumers that only need edges whose
    * connected components CONTAIN the true near-dup components — e.g.
    * a leakage-safe train/heldout split, where extra edges only merge
    * more groups and can never put two near-duplicates on opposite
    * sides — can take the candidate set directly and skip it.
    * LeakageSplitSpec pins the superset property.
    */
  def ppjoinCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // Same exact-duplicate collapse as [[ngramJaccardJoin]]. The
    // equality argument needs one more ingredient than the verify
    // pipeline's: candidacy depends on the global rarest-first (df,
    // shingle) prefix ORDER, which is a corpus-wide statistic, not a
    // function of the two sets alone — collapsing a 1000-member dup
    // family would drop its shingles' df from ~1000 to 1 and reshuffle
    // every doc's prefix. So the collapsed join computes df WEIGHTED by
    // group size (`w` from setCollapse): Σ w over reps containing a
    // shingle equals the full-corpus count exactly, the prefix order is
    // bit-identical to the direct path's, identical sets get identical
    // prefixes, and the collapsed candidate set equals the direct one
    // EXACTLY, not just up to connected components (LeakageSplitSpec
    // pins candidate equality on a dup-heavy corpus).
    val sets = cached(
      df.select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
        .withColumn("sz", size(col("sh"))))
    if (!collapseWorthwhile(sets)) {
      // Same small-corpus fast path as [[ngramJaccardJoin]]: direct
      // candidates with w = 1 (the unweighted df IS the full-corpus df
      // when nothing was collapsed), plus the explicit empty-set family.
      return emptySetPairs(sets)
        .filter(lit(1.0) >= threshold)
        .unionByName(ppjoinCandidatesFromSets(
          sets.withColumn("w", lit(1L)), threshold))
    }
    val (memb, repSets) = setCollapse(sets)
    intraGroupPairs(memb)
      .filter(lit(1.0) >= threshold)
      .unionByName(expandRepPairs(
        ppjoinCandidatesFromSets(repSets, threshold), memb, Seq.empty))
  }

  /** Exact-duplicate collapse for the set-similarity self-joins: group
    * docs by a 128-bit fingerprint of the sorted shingle set (two
    * independently-salted xxhash64s — collision odds at 5M distinct
    * sets ≈ 1e-25, and a collision could only ever MERGE two groups,
    * never lose a true pair's doc). Returns (members, repSets):
    * members = (id, rep) with rep = min id of the doc's identical-set
    * group; repSets = the one-representative-per-group subset of
    * `sets` PLUS a `w` column = the group's member count, so collapsed
    * consumers can reconstruct full-corpus statistics (document
    * frequency = Σ w over the reps containing a shingle — identical
    * sets contribute identical shingles, so the weighted count over
    * reps IS the unweighted count over all docs). Both shuffles are
    * narrow (ids + two longs); the shingle arrays themselves never
    * leave the scan that fingerprints them.
    */
  /** Should the exact-dup collapse run for this corpus? Collapse is a
    * flood defense: it converts a 1000-member identical-set family's
    * ~500k foregone-conclusion verify pairs into one representative. On
    * a small corpus with few duplicates it is pure constant — a window
    * shuffle, a membership checkpoint and two expansion joins that the
    * r11 board measured as most of d_dedup_ppjoin's small-SF overhead.
    *
    * Decision, cheapest-signal-first: above [[CollapseMinDocs]] docs,
    * collapse unconditionally (scale regime — no probe shuffle added to
    * the big path). Below it, ONE narrow aggregation (two xxhash64s per
    * doc, map-side-combined groupBy) measures the intra-family pair
    * mass Σ c·(c−1)/2; collapse engages iff that mass is a material
    * fraction of [[DirectVerifyMaxPairs]] — so a small-but-flooded
    * corpus (90k copies of one doc) still collapses, by measurement
    * rather than by doc count. `sets` is Materialize'd by every caller,
    * so the count and the probe read the checkpoint, not the lineage.
    */
  private def collapseWorthwhile(sets: DataFrame): Boolean = {
    if (sets.count() > CollapseMinDocs) return true
    val dupPairs = sets
      .select(xxhash64(sort_array(col("sh"))).as("f1"),
        xxhash64(lit("graft.setfp2"), sort_array(col("sh"))).as("f2"))
      .groupBy("f1", "f2").agg(count(lit(1)).as("c"))
      // Σ c·(c−1) (twice the pair count) keeps the sum in LONG — `/`
      // on columns is fractional division.
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).as("dp2"))
      .head().getLong(0) / 2
    dupPairs > DirectVerifyMaxPairs / 4
  }

  /** Docs below this count probe for duplicate floods instead of
    * collapsing unconditionally (~the corpus size where the collapse
    * machinery's fixed shuffles stop being measurable against the
    * verify pipeline itself).
    */
  private[graft] val CollapseMinDocs = 1L << 19

  /** All unordered pairs of docs whose shingle set carries NO anchor —
    * empty or null `sh` (a null text under wordShingles; a genuinely
    * empty array can only come from a caller-prepared frame, since the
    * whole-text short-doc rule emits at least [""]). These are invisible
    * to the prefix index (nothing to anchor on) and the one family the
    * no-collapse fast path must emit explicitly to match the collapsed
    * path's intra-group contract (setCollapse groups null sets under one
    * fingerprint the same way). The single constant rep keys an equi
    * join; output is quadratic in that doc count, which is the
    * operator's contract for identical docs. Vacuous on any wordShingles
    * corpus without null texts — a defensive parity guard, not a hot
    * path.
    */
  private def emptySetPairs(sets: DataFrame): DataFrame =
    intraGroupPairs(
      sets.filter(col("sz").isNull || col("sz") === 0)
        .select(col("id"), lit(0L).as("rep")))

  private def setCollapse(sets: DataFrame): (DataFrame, DataFrame) = {
    val keyed = sets.select(col("id"),
      xxhash64(sort_array(col("sh"))).as("f1"),
      xxhash64(lit("graft.setfp2"), sort_array(col("sh"))).as("f2"))
    val grpWin = Window.partitionBy(col("f1"), col("f2"))
    val memb = cached(keyed
      .withColumn("rep", min(col("id")).over(grpWin))
      .withColumn("w", count(lit(1)).over(grpWin))
      .select("id", "rep", "w"))
    val repSets = sets.join(
      memb.filter(col("id") === col("rep")).select(col("id"), col("w")),
      Seq("id"))
    (memb.select("id", "rep"), repSets)
  }

  /** All unordered same-group pairs (id_a < id_b) of a (id, rep)
    * membership frame — every one Jaccard 1 by construction. Output is
    * quadratic in group size, but that is the OPERATOR's contract
    * (those pairs exist); the rows are two longs, with no shingle
    * payload and no verification work attached.
    */
  private def intraGroupPairs(memb: DataFrame): DataFrame =
    memb.as("a").join(memb.as("b"),
        col("a.rep") === col("b.rep") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))

  /** Expand representative-level pairs back to member-level pairs:
    * every (member of a's group) × (member of b's group) combo, carrying
    * `extra` columns (e.g. the jaccard score — exact for every combo,
    * because members have byte-identical sets). Groups are disjoint and
    * rep pairs are distinct, so the expansion emits no duplicates.
    */
  private def expandRepPairs(repPairs: DataFrame, memb: DataFrame,
      extra: Seq[String]): DataFrame =
    repPairs
      .join(memb.select(col("rep").as("id_a"), col("id").as("ma")), Seq("id_a"))
      .join(memb.select(col("rep").as("id_b"), col("id").as("mb")), Seq("id_b"))
      .select(least(col("ma"), col("mb")).as("id_a") +:
        greatest(col("ma"), col("mb")).as("id_b") +: extra.map(col): _*)

  /** Candidate machinery for the PUBLIC string-universe candidate set:
    * [[ppjoinCandidates]]' x_leakage_split_fast oracle replays the string
    * (df, shingle) prefix order bit-exactly, so this path keeps shingle
    * STRINGS as keys. The verified pipeline ([[verifiedJaccardPairs]])
    * does NOT route through here — it runs the clustered fingerprint
    * pipeline above, whose candidate universe is (df, h, h2)-ordered.
    *
    * `sets` must carry a `w` weight column (per-doc multiplicity): the
    * document frequency that orders the prefix is Σ w, so a collapsed
    * caller (each rep weighted by its identical-set group size)
    * reproduces the full-corpus df order exactly. Direct (no-collapse)
    * callers pass w = 1. `private[graft]` so LeakageSplitSpec can pin
    * collapsed ≡ direct at the candidate level.
    */
  private[graft] def ppjoinCandidatesFromSets(sets: DataFrame,
      threshold: Double): DataFrame = {
    // NOTE perf: unlike ngramJaccardTopK, pre-spreading this exploded
    // frame by shingle measured SLOWER (2.0 s vs 1.8 s at sf0.1) — the df
    // join needs the raw rows again, so partial-agg compression of the
    // count side wins over exchange reuse. Likewise materializing
    // `prefixes` (2.15 s): the self-join's identical subtrees already
    // dedup via ReuseExchange, so the eager checkpoint is pure overhead.
    val exploded = sets.select(col("id"), col("w"), explode(col("sh")).as("shingle"))
    // Global rarest-first total order: (document frequency, shingle) —
    // df is the WEIGHTED occurrence count (Σ w), i.e. the full-corpus
    // doc count even when the caller collapsed exact-dup groups.
    // Deliberately NO broadcast hints and NO in-list pair generation in
    // this EXACT variant: the df table is vocabulary-sized and a hot
    // prefix shingle's posting list is unbounded (no df-cut to lean on),
    // so the shuffle join is the plan that survives corpus scale.
    val ranked = exploded.join(
        exploded.groupBy("shingle").agg(sum(col("w")).as("df_")), "shingle")
    // Per-doc prefix of the df-sorted shingle list. Materialized: the
    // candidate self-join reads it on both sides, and its construction
    // (df join + per-doc sort) is most of the query's work. The sort key
    // IS struct(df_, shingle), so the shingle rides in the struct once —
    // an earlier shape carried it twice (inside ord AND alongside),
    // doubling the prefix build's shuffle bytes.
    val prefixes = ranked
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df_"), col("shingle")))).as("sorted"),
        count(lit(1)).as("sz"))
      .select(col("id"), col("sz"),
        explode(slice(transform(col("sorted"), _.getField("shingle")),
          lit(1), (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")))
          .as("shingle"))
    // PPJoin LENGTH filter alongside the prefix filter: Jaccard ≥ t
    // forces t·|A| ≤ |B| ≤ |A|/t, so size-incompatible pairs are pruned
    // INSIDE the join — sound (the candidate set stays a superset of
    // the true pairs; LeakageSplitSpec's refinement proof still holds),
    // and it is the bound that keeps hot prefix shingles from pairing
    // short docs against everything at corpus scale.
    prefixes.as("a").join(prefixes.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
        col("b.sz") >= col("a.sz") * threshold &&
        col("a.sz") >= col("b.sz") * threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Add a minhash signature column `sig` (array<bigint>, `numHashes`
    * long). Hash family: xxhash64(shingle, seed_i) via the native
    * MinhashSig expression — one narrow projection, no shuffle.
    */
  def withMinhashSignature(df: DataFrame, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32): DataFrame =
    df.withColumn("sig", minhashSig(wordShingles(col(textCol), shingleN), numHashes))

  /** LSH band keys from a minhash signature: one 64-bit key per band of
    * `rowsPerBand` signature positions.
    */
  def bandKeys(sig: Column, numHashes: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numHashes / rowsPerBand - 1)),
      b => xxhash64(concat_ws("_",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))), b))

  /** Near-duplicate candidate pairs via MinHash-LSH, ranked by estimated
    * Jaccard (fraction of matching signature positions). `maxBucket` caps
    * degenerate buckets (skew guard for the self-join at scale).
    */
  def minhashLshTopK(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      k: Int = 20, maxBucket: Int = 100): DataFrame = {
    // Materialized: signatures are re-read by the band explode and both
    // sides of the candidate verification join (3 passes otherwise).
    val sigs = cached(withMinhashSignature(
        df.select(col(idCol).as("id"), col(textCol)), textCol, shingleN, numHashes)
      .select(col("id"), col("sig"), bandKeys(col("sig"), numHashes, rowsPerBand).as("bands")))
    val ex = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band", "key")))
    val bounded = ex.join(
      ex.groupBy("band", "key").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1 && col("bucket_n") <= maxBucket),
      Seq("band", "key"))
    val cands = bounded.as("a").join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val est = cands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
    est.select("id_a", "id_b", "est_jaccard")
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** INCREMENTAL near-dup check: flag documents of a NEW batch whose
    * minhash bands collide with the standing corpus and whose signature
    * similarity clears `threshold` — the "dedup incoming crawl against
    * the training set" op. No corpus self-join: the corpus contributes
    * only its (band, key) index side, so the join cost scales with the
    * BATCH, and the corpus index is exactly what a production pipeline
    * keeps materialized between runs.
    * Returns (id, n_matches, best_match, best_est) per flagged new doc.
    */
  def minhashIncremental(corpus: DataFrame, newBatch: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 32,
      rowsPerBand: Int = 2, threshold: Double = 0.5,
      maxBucket: Int = 100): DataFrame = {
    def sigs(df: DataFrame) = withMinhashSignature(
        df.select(col(idCol).as("id"), col(textCol)), textCol, shingleN, numHashes)
      .select(col("id"), col("sig"),
        bandKeys(col("sig"), numHashes, rowsPerBand).as("bands"))
    // Materialized (leak-free, see `cached`): each side is read by the
    // band index AND the verification join; a long-lived session keeps
    // no pinned cache entries behind after the query's action.
    val corpusSigs = cached(sigs(corpus))
    val newSigs = cached(sigs(newBatch))
    val corpusIx = corpusSigs
      .select(col("id").as("corpus_id"), posexplode(col("bands")).as(Seq("band", "key")))
    // Degenerate-bucket cap on the corpus side (same skew guard as the
    // self-join variant).
    val bounded = corpusIx.join(
      corpusIx.groupBy("band", "key").agg(count(lit(1)).as("n"))
        .filter(col("n") <= maxBucket),
      Seq("band", "key"))
    val cands = newSigs
      .select(col("id"), posexplode(col("bands")).as(Seq("band", "key")))
      .join(bounded, Seq("band", "key"))
      .select(col("id"), col("corpus_id")).distinct()
    cands
      .join(newSigs.select(col("id"), col("sig")), "id")
      .join(corpusSigs.select(col("id").as("cid"), col("sig").as("csig")),
        col("corpus_id") === col("cid"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig"), col("csig"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"),
        max(struct(col("est_jaccard"), col("corpus_id"))).as("best"))
      .select(col("id"), col("n_matches"),
        col("best.corpus_id").as("best_match"), col("best.est_jaccard").as("best_est"))
      .orderBy(col("id"))
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit simhash of the token multiset: bit j is set when the sum over
    * tokens of ±1 (by bit j of the token hash) is positive. Narrow
    * projection, one pass.
    */
  def simhash(text: Column): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(text)))

  /** Near-duplicate pairs by simhash hamming distance, candidates from
    * 16-bit band collisions (4 bands over the 64-bit hash — guarantees
    * recall for hamming ≤ 3, the standard Charikar banding).
    */
  def simhashTopK(df: DataFrame, idCol: String, textCol: String, k: Int = 20,
      maxBucket: Int = 200): DataFrame = {
    val h = cached(df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh")))
    val ex0 = h.select(col("id"), col("sh"), posexplode(
      transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh"), b * 16).bitwiseAND(0xffffL))).as(Seq("band", "key")))
    // Same skew guard as MinHash-LSH: drop degenerate bands whose bucket
    // would make the self-join quadratic.
    val ex = ex0.join(
      ex0.groupBy("band", "key").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > 1 && col("bucket_n") <= maxBucket),
      Seq("band", "key"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
    pairs.withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .select("id_a", "id_b", "hamming")
      .orderBy(col("hamming").asc, col("id_a"), col("id_b"))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // Bloom-gated incremental exact dedup
  // ------------------------------------------------------------------

  /** New-rows-only gate for incremental EXACT dedup where the corpus is
    * huge and the batch is small — the 100 TB shape where even a
    * broadcast-batch semi-join against the corpus is worth avoiding
    * unless needed:
    *
    *  1. the corpus keys fold into a Bloom filter via constant-size
    *     per-partition sketches (`stat.bloomFilter` treeAggregates — the
    *     corpus is READ once and never shuffled);
    *  2. the batch probes the broadcast filter — most genuinely-new keys
    *     die here at ~zero cost;
    *  3. only the tiny might-contain survivor set is confirmed against
    *     the corpus with a broadcast semi-join (corpus side stays a
    *     map-side scan — still no corpus shuffle), eliminating Bloom
    *     false positives.
    *
    * Exactness: the filter has no false negatives, so dropping
    * non-members at step 2 loses nothing, and step 3 restores exactness
    * for false positives. Returns the batch rows whose `keyCol` is NOT
    * in the corpus — byte-equal to a plain anti-join (spec'd).
    *
    * The probe is a native codegen'd expression
    * ([[graft.functions.BloomMightContain]]) over the broadcast filter —
    * the r9 ADVICE closed: the previous Scala-UDF probe broke
    * whole-stage codegen on the batch projection for no semantic reason.
    */
  def bloomGate(corpus: DataFrame, batch: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = corpus.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val candidates = batch.select(col(keyCol))
      .filter(GraftBridge.column(graft.functions.BloomMightContain(
        GraftBridge.expression(col(keyCol)), bc)))
      .distinct()
    val confirmed = corpus.select(col(keyCol))
      .join(broadcast(candidates), Seq(keyCol), "left_semi").distinct()
    batch.join(broadcast(confirmed), Seq(keyCol), "left_anti")
  }
}
