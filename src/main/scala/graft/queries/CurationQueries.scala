package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Pack, TextDedup}
import graft.sources.Tables

/** Round-3 curation + SQL-surface widening (SURVEY.md §2.3/§2.2):
  * span-granular exact dedup, sequence packing, chunking, mixture
  * reweighting, unpivot, int8 vector quantization, bit-exact cosine, and
  * the recursive-CTE / LATERAL corners of the SQL surface.
  *
  * Float discipline for the vector ops: every floating output is reduced
  * in a FIXED fold order on both engines (Spark `aggregate`, DuckDB
  * `list_reduce` — left folds over the same per-index expressions), then
  * published as `floor(x * 1eN)` integers. Multiply-and-floor of
  * bit-identical doubles is deterministic on both engines, unlike
  * `round()`, whose half-up/half-even and internal scaling differ.
  */
object CurationQueries {

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // 50: C4-style exact span dedup with document reassembly
    Q("d_dedup_spans",
      (s, dir) => TextDedup.spanDedup(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        idx AS (SELECT doc_id, t,
                       unnest(range(0, (len(t) + 9) // 10)) AS chunk_idx FROM toks),
        chunks AS (SELECT doc_id, chunk_idx,
                          array_to_string(t[chunk_idx*10+1 : chunk_idx*10+10], ' ') AS ch
                   FROM idx),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY ch ORDER BY doc_id, chunk_idx) AS rn
                   FROM chunks)
        SELECT doc_id, string_agg(ch, ' ' ORDER BY chunk_idx) AS text_clean,
               COUNT(*) AS n_kept
        FROM ranked WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
      """)),

    // ------------------------------------------------------------------
    // 51: concatenate-and-split sequence packing (two-phase prefix sum on
    // the Spark side; the oracle's single window states the semantics)
    Q("x_seq_pack",
      (s, dir) => Pack.seqPack(Tables.documents(s, dir), "doc_id", "text",
          capacity = 256, bucketRows = 50)
        .orderBy("doc_id"),
      Some("""
        WITH toks AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        cum AS (SELECT doc_id, n_tok,
                       sum(n_tok) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
                FROM toks)
        SELECT doc_id, n_tok,
               CAST((cum_end - n_tok) // 256 AS BIGINT) AS bin,
               CAST((cum_end - n_tok) % 256 AS BIGINT) AS bin_off,
               CAST((cum_end - 1) // 256 - (cum_end - n_tok) // 256 + 1 AS BIGINT) AS n_bins
        FROM cum ORDER BY doc_id
      """)),

    // ------------------------------------------------------------------
    // 52: overlapping fixed-size chunking (200-char windows, stride 150)
    Q("x_doc_chunk",
      (s, dir) => Pack.docChunk(Tables.documents(s, dir), "doc_id", "text",
          size = 200, stride = 150)
        .orderBy("doc_id", "chunk_idx"),
      Some("""
        WITH idx AS (SELECT doc_id, text,
                            unnest(range(0, (len(text) - 1) // 150 + 1)) AS ci
                     FROM documents)
        SELECT doc_id, ci AS chunk_idx,
               substr(text, CAST(ci*150 + 1 AS INT), 200) AS chunk,
               len(substr(text, CAST(ci*150 + 1 AS INT), 200)) AS chunk_len
        FROM idx ORDER BY doc_id, chunk_idx
      """)),

    // ------------------------------------------------------------------
    // 53: domain-mixture reweighting — per-source sampling rates toward a
    // target mix (head sources 10% each, tail uniform), applied via the
    // same deterministic content-hash rule as x_hash_sample. The rate
    // math is identical double ops on both engines; rate_e6 is the
    // floor-scaled publication.
    Q("x_domain_mix",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val stats = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        val tot = stats.agg(sum("n_docs").as("n"))
        val rates = stats.crossJoin(broadcast(tot))
          .withColumn("share",
            when(col("source").isin("src0", "src1", "src2", "src3", "src4"), lit(0.10))
              .otherwise(lit(1.0 / 30)))
          .withColumn("rate", least(lit(1.0), col("share") * col("n") / col("n_docs")))
        docs
          .withColumn("u",
            conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long")
              / lit(4294967296.0))
          .join(broadcast(rates), "source")
          .groupBy(col("source"), col("n_docs"),
            expr("CAST(floor(rate * 1e6) AS BIGINT)").as("rate_e6"),
            expr("CAST(floor(rate * n_docs) AS BIGINT)").as("expected_kept"))
          .agg(sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("kept"))
          .orderBy("source")
      },
      Some("""
        WITH stats AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM stats),
        rates AS (
          SELECT source, n_docs,
                 least(1.0, (CASE WHEN source IN ('src0','src1','src2','src3','src4')
                                  THEN 0.10 ELSE 1.0/30 END) * n / n_docs) AS rate
          FROM stats, tot)
        SELECT r.source, r.n_docs,
               CAST(floor(r.rate * 1e6) AS BIGINT) AS rate_e6,
               CAST(floor(r.rate * r.n_docs) AS BIGINT) AS expected_kept,
               COUNT(*) FILTER (WHERE ('0x' || substr(sha256(d.text), 1, 8))::UBIGINT
                                       / 4294967296.0 < r.rate) AS kept
        FROM rates r JOIN documents d ON d.source = r.source
        GROUP BY r.source, r.n_docs, r.rate ORDER BY r.source
      """)),

    // ------------------------------------------------------------------
    // 54: unpivot/melt (wide metrics → long) — Spark Dataset.unpivot vs
    // the oracle's UNION ALL statement of the same semantics
    Q("t_unpivot",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""
        WITH src AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                            l_discount, l_tax
                     FROM lineitem WHERE l_orderkey < 100)
        SELECT l_orderkey, l_linenumber, metric, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src)
        ORDER BY l_orderkey, l_linenumber, metric
      """)),

    // ------------------------------------------------------------------
    // 55: int8 vector quantization (symmetric, per-vector scale) — the
    // embedding-compression step before ANN at scale. Bounded slice:
    // the op is a narrow projection, the bound keeps bench cost flat.
    Q("s_vec_quantize",
      (s, dir) => Tables.embeddings(s, dir)
        .filter(col("vec_id") < 100)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / 127.0"))
        .withColumn("q", expr("transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))"))
        .select(col("vec_id"),
          expr("CAST(floor(scale * 1e12) AS BIGINT)").as("scale_e12"),
          expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
          expr("""CAST(floor(aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),
              (a, i) -> a + (element_at(v, i) - element_at(q, i) * scale)
                          * (element_at(v, i) - element_at(q, i) * scale)) * 1e9) AS BIGINT)""")
            .as("sq_err_e9"))
        .orderBy("vec_id"),
      Some("""
        WITH base AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < 100),
        sc AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM base),
        qz AS (SELECT vec_id, scale, v,
                      list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q
               FROM sc)
        SELECT vec_id,
               CAST(floor(scale * 1e12) AS BIGINT) AS scale_e12,
               list_reduce(q, (a, b) -> a + b) AS q_sum,
               CAST(floor(list_reduce(list_transform(range(1, 65),
                      i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale)),
                    (a, b) -> a + b) * 1e9) AS BIGINT) AS sq_err_e9
        FROM qz ORDER BY vec_id
      """)),

    // ------------------------------------------------------------------
    // 56: bit-exact cosine top-k — the ORACLE-CHECKED twin of
    // s_cosine_topk (which stays on the fast native VecDot path):
    // fixed-order folds make the doubles identical across engines, so
    // the ranking itself is verified, not just row counts. Corpus side
    // bounded so the interpreted-HOF cost stays flat across SFs.
    Q("s_cosine_exact",
      (s, dir) => {
        val base = Tables.embeddings(s, dir).filter(col("vec_id") < 2000)
          .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("nrm",
            expr("sqrt(aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE), (a, x) -> a + x))"))
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
        val pairs = base.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("dot",
            expr("aggregate(zip_with(qv, v, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"))
          .withColumn("cosine", col("dot") / (col("qnrm") * col("nrm")))
        pairs
          .withColumn("rk", row_number().over(
            Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("query_id"), col("vec_id"),
            expr("CAST(floor(cosine * 1e9) AS BIGINT)").as("cosine_e9"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some("""
        WITH base AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < 2000),
        normed AS (
          SELECT vec_id, v,
                 sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
          FROM base),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM normed WHERE vec_id < 10),
        pairs AS (
          SELECT query_id, vec_id,
                 list_reduce(list_transform(range(1, 65), i -> qv[i] * v[i]), (a, b) -> a + b)
                   / (qnrm * nrm) AS cosine
          FROM q, normed WHERE vec_id <> query_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS rk FROM pairs)
        SELECT query_id, vec_id, CAST(floor(cosine * 1e9) AS BIGINT) AS cosine_e9, rk
        FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
      """)),

    // ------------------------------------------------------------------
    // 54b: CDC changelog apply — a deterministic I/U/D changelog (derived
    // from orders: P→delete, O→update, F→insert-new-key) compacted onto
    // the customer snapshot via Transform.applyChangelog. Latest change
    // per key wins (orderdate desc, then orderkey desc via the negated
    // tiebreaker); deletes remove, I/U upsert.
    Q("t_cdc_apply",
      (s, dir) => {
        val snap = Tables.customer(s, dir).select(
          col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"),
          lit("snapshot").as("src"))
        val chg = Tables.orders(s, dir).select(
          when(col("o_orderstatus") === "F", col("o_orderkey") + 1000000L)
            .otherwise(col("o_custkey")).as("custkey"),
          col("o_totalprice").as("acctbal"),
          lit("changed").as("src"),
          when(col("o_orderstatus") === "P", "D")
            .when(col("o_orderstatus") === "O", "U").otherwise("I").as("op"),
          col("o_orderdate").as("s1"), (-col("o_orderkey")).as("s2"))
        graft.operators.Transform.applyChangelog(
            snap, chg, keys = Seq("custkey"), opCol = "op",
            latestBy = Some("s1"), tieBreakers = Seq("s2"))
          .orderBy("custkey")
      },
      Some("""
        WITH snap AS (SELECT c_custkey AS custkey, c_acctbal AS acctbal,
                             'snapshot' AS src FROM customer),
        chg AS (SELECT CASE WHEN o_orderstatus = 'F' THEN o_orderkey + 1000000
                            ELSE o_custkey END AS custkey,
                       o_totalprice AS acctbal, 'changed' AS src,
                       CASE WHEN o_orderstatus = 'P' THEN 'D'
                            WHEN o_orderstatus = 'O' THEN 'U' ELSE 'I' END AS op,
                       o_orderdate AS s1, -o_orderkey AS s2
                FROM orders),
        last AS (SELECT * FROM (
                   SELECT *, row_number() OVER (PARTITION BY custkey
                     ORDER BY s1 DESC NULLS LAST, s2 ASC) AS rn FROM chg)
                 WHERE rn = 1)
        SELECT custkey, acctbal, src FROM snap
        WHERE custkey NOT IN (SELECT custkey FROM last)
        UNION ALL
        SELECT custkey, acctbal, src FROM last WHERE op <> 'D'
        ORDER BY custkey
      """)),

    // ------------------------------------------------------------------
    // 56b: unigram rarity score — the perplexity-proxy quality signal
    // (mean inverse unigram probability, the transcendental-free stand-in
    // for mean surprisal: rank order matches -log p for unigram models).
    // INTEGER-ONLY math ((total*1000) div cnt, then div n_tok) so the
    // corpus-wide aggregation is exact and order-independent on both
    // engines. Two shuffles (tf agg, per-doc agg); tf is vocabulary-sized
    // and broadcasts.
    Q("x_rarity_score",
      (s, dir) => {
        val ex = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val tf = ex.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val tot = tf.agg(sum("cnt").as("total"))
        ex.join(broadcast(tf), "tok")
          .crossJoin(broadcast(tot))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            expr("CAST(sum((total * 1000) div cnt) div count(1) AS BIGINT)").as("rarity"))
          .orderBy("doc_id")
      },
      Some("""
        WITH ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        tf AS (SELECT tok, COUNT(*) AS cnt FROM ex GROUP BY tok),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf)
        SELECT doc_id, COUNT(*) AS n_tok,
               CAST(sum((total*1000) // cnt) // COUNT(*) AS BIGINT) AS rarity
        FROM ex JOIN tf USING (tok), tot
        GROUP BY doc_id ORDER BY doc_id
      """)),

    // ------------------------------------------------------------------
    // 56e: BM25 keyword ranking (`TextRank.bm25`) — terms cut BEFORE any
    // shuffle, corpus stats + per-term dfs reduced to broadcast rows, and
    // the score summed in a FIXED term order. Oracle uses the log-free
    // odds-ratio idf (ranking-monotone; libm ln isn't bit-identical
    // cross-engine, +,-,*,/ are); the classic ln-idf variant is spec'd
    // against a driver reference in TextOpsSpec.
    Q("x_bm25_rank",
      (s, dir) => graft.operators.TextRank.bm25(
          Tables.documents(s, dir), "doc_id", "text",
          terms = Seq("join", "merge", "query"), topK = 10, lnIdf = false)
        .select(col("id").as("doc_id"), col("dl"),
          expr("CAST(floor(score * 1e6) AS BIGINT)").as("score_e6"))
        .orderBy(col("score_e6").desc, col("doc_id")),
      Some("""
        WITH toks AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
                             string_split(text, ' ') AS tk FROM documents),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         CAST(SUM(dl) AS BIGINT) AS tot_dl FROM toks),
        ex AS (SELECT doc_id, dl, unnest(tk) AS tok FROM toks),
        tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
               FROM ex WHERE tok IN ('join', 'merge', 'query') GROUP BY 1, 2, 3),
        dfs AS (SELECT
                  CAST(coalesce(SUM(CASE WHEN tok = 'join' THEN 1 END), 0) AS DOUBLE) AS df_join,
                  CAST(coalesce(SUM(CASE WHEN tok = 'merge' THEN 1 END), 0) AS DOUBLE) AS df_merge,
                  CAST(coalesce(SUM(CASE WHEN tok = 'query' THEN 1 END), 0) AS DOUBLE) AS df_query
                FROM tf),
        piv AS (SELECT doc_id, dl,
                       MAX(CASE WHEN tok = 'join' THEN tf END) AS tf_join,
                       MAX(CASE WHEN tok = 'merge' THEN tf END) AS tf_merge,
                       MAX(CASE WHEN tok = 'query' THEN tf END) AS tf_query
                FROM tf GROUP BY 1, 2),
        scored AS (SELECT doc_id, dl,
            (n_docs - df_join + 0.5) / (df_join + 0.5)
              * (coalesce(tf_join, 0.0) * (1.2 + 1.0))
              / (coalesce(tf_join, 0.0)
                 + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
                          / (CAST(tot_dl AS DOUBLE) / n_docs)))
          + (n_docs - df_merge + 0.5) / (df_merge + 0.5)
              * (coalesce(tf_merge, 0.0) * (1.2 + 1.0))
              / (coalesce(tf_merge, 0.0)
                 + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
                          / (CAST(tot_dl AS DOUBLE) / n_docs)))
          + (n_docs - df_query + 0.5) / (df_query + 0.5)
              * (coalesce(tf_query, 0.0) * (1.2 + 1.0))
              / (coalesce(tf_query, 0.0)
                 + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
                          / (CAST(tot_dl AS DOUBLE) / n_docs))) AS score
          FROM piv, dfs, stats)
        SELECT doc_id, dl, CAST(floor(score * 1e6) AS BIGINT) AS score_e6
        FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 10)
        ORDER BY score_e6 DESC, doc_id
      """)),

    // ------------------------------------------------------------------
    // 56c: CSV sink + source round trip — documents (free text, quoted)
    // written through the CSV writer and read back with an explicit
    // schema, then aggregated per language with a content checksum. The
    // oracle aggregates the parquet original: equality proves the CSV
    // path is lossless (quoting/escaping of free text included).
    Q("t_csv_roundtrip",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_roundtrip-${ProcessHandle.current().pid()}"
        docs.write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.schema(docs.schema).option("header", "true").csv(tmp)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("bigint").as("chars"),
            sum(conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long"))
              .cast("bigint").as("hsum"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, COUNT(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(sum(('0x' || substr(sha256(text), 1, 8))::UBIGINT) AS BIGINT) AS hsum
        FROM documents GROUP BY lang ORDER BY lang
      """)),

    // ------------------------------------------------------------------
    // 56d: heavy hitters via the SpaceSaving sketch — one pass, constant
    // `capacity`-counter summary per partition, associative merge; only
    // 64 counters per partition cross the shuffle no matter the token
    // cardinality. The oracle is the exact count (valid because the
    // corpus vocabulary ≤ capacity, so the sketch is provably exact
    // here); the sketch's soundness BOUNDS under overflow are spec'd
    // separately in CurationSpec.
    Q("x_heavy_hitters",
      (s, dir) => Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(graft.functions.heavyHitters(col("tok"), 64).as("hh"))
        .select(posexplode(col("hh")).as(Seq("pos", "e")))
        .filter(col("pos") < 10)
        .select(col("e.item").as("item"), col("e.count_hi").as("count_hi"),
          col("e.count_lo").as("count_lo"), (col("pos") + 1).cast("long").as("rk"))
        .orderBy("rk"),
      Some("""
        WITH ex AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS c FROM ex GROUP BY tok)
        SELECT tok AS item, c AS count_hi, c AS count_lo,
               row_number() OVER (ORDER BY c DESC, tok) AS rk
        FROM cnt ORDER BY rk LIMIT 10
      """)),

    // ------------------------------------------------------------------
    // 57: recursive CTE — calendar spine (month series spanning the order
    // history) left-joined to monthly order counts, empty months kept.
    // Exercises Spark 4's WITH RECURSIVE through the SQL surface.
    Q("q_recursive_spine",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("rs_orders")
        // The spine bounds are TWO scalars — resolve them eagerly and
        // inline as literals. Leaving them as a `bounds` CTE makes every
        // recursion step re-scan + re-aggregate orders (the recursive
        // member cross-joins bounds; measured 11 s at sf0.1 vs <1 s
        // inlined). One O(1)-result agg up front is the honest plan.
        val Array(lo, hi) = s.sql(
          """SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS STRING),
                    CAST(date_trunc('MONTH', max(o_orderdate)) AS STRING)
             FROM rs_orders""").head().toSeq.map(_.toString).toArray
        s.sql(s"""
          WITH RECURSIVE spine(m) AS (
            SELECT TIMESTAMP '$lo'
            UNION ALL SELECT m + INTERVAL '1' MONTH FROM spine
            WHERE m < TIMESTAMP '$hi'),
          monthly AS (SELECT date_trunc('MONTH', o_orderdate) AS m, COUNT(*) AS n_orders
                      FROM rs_orders GROUP BY 1)
          SELECT CAST(s.m AS DATE) AS month, coalesce(n_orders, 0) AS n_orders
          FROM spine s LEFT JOIN monthly mo ON mo.m = s.m ORDER BY 1
        """)
      },
      Some("""
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('month', min(o_orderdate)) AS lo,
                 date_trunc('month', max(o_orderdate)) AS hi FROM orders),
        spine(m) AS (
          SELECT lo FROM bounds
          UNION ALL SELECT m + INTERVAL 1 MONTH FROM spine, bounds WHERE m < hi),
        monthly AS (SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n_orders
                    FROM orders GROUP BY 1)
        SELECT CAST(s.m AS DATE) AS month, coalesce(n_orders, 0) AS n_orders
        FROM spine s LEFT JOIN monthly mo ON mo.m = s.m ORDER BY 1
      """)),

    // ------------------------------------------------------------------
    // 65: column profiling — per-column counts/nulls/min/max/mean in ONE
    // scan (16 aggregates in a single pass, then pivoted to one row per
    // column) — the standalone data-profiling audit; at 100 TB the
    // one-pass shape is the whole point (per-column queries would be N
    // scans).
    Q("t_column_profile",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val li = Tables.lineitem(s, dir)
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          count(when(col(c).isNull, 1)).as(s"nu_$c"),
          min(col(c)).as(s"mn_$c"),
          max(col(c)).as(s"mx_$c"),
          Q.dsum(col(c)).as(s"sm_$c")))
        li.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"),
            col(s"nn_$c").as("n_nonnull"),
            col(s"nu_$c").as("n_null"),
            col(s"mn_$c").as("min_v"),
            col(s"mx_$c").as("max_v"),
            expr(s"CAST(floor(sm_$c / nn_$c * 1e6) AS BIGINT)").as("mean_e6")
          )).toIndexedSeq: _*)).as("p"))
          .select("p.*")
          .orderBy("col_name")
      },
      Some("""
        WITH s AS (SELECT
          COUNT(l_quantity) AS nn_q, COUNT(*) - COUNT(l_quantity) AS nu_q,
            min(l_quantity) AS mn_q, max(l_quantity) AS mx_q,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sm_q,
          COUNT(l_extendedprice) AS nn_e, COUNT(*) - COUNT(l_extendedprice) AS nu_e,
            min(l_extendedprice) AS mn_e, max(l_extendedprice) AS mx_e,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sm_e,
          COUNT(l_discount) AS nn_d, COUNT(*) - COUNT(l_discount) AS nu_d,
            min(l_discount) AS mn_d, max(l_discount) AS mx_d,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sm_d,
          COUNT(l_tax) AS nn_t, COUNT(*) - COUNT(l_tax) AS nu_t,
            min(l_tax) AS mn_t, max(l_tax) AS mx_t,
            CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sm_t
          FROM lineitem)
        SELECT col_name, n_nonnull, n_null, min_v, max_v,
               CAST(floor(sm / n_nonnull * 1e6) AS BIGINT) AS mean_e6
        FROM (
          SELECT 'l_quantity' AS col_name, nn_q AS n_nonnull, nu_q AS n_null,
                 mn_q AS min_v, mx_q AS max_v, sm_q AS sm FROM s
          UNION ALL SELECT 'l_extendedprice', nn_e, nu_e, mn_e, mx_e, sm_e FROM s
          UNION ALL SELECT 'l_discount', nn_d, nu_d, mn_d, mx_d, sm_d FROM s
          UNION ALL SELECT 'l_tax', nn_t, nu_t, mn_t, mx_t, sm_t FROM s)
        ORDER BY col_name
      """)),

    // ------------------------------------------------------------------
    // 67: custom DataSource V2 scan — the graft-synth connector
    // (deterministic generated documents; doc_id pushdown narrows the
    // GENERATED ranges, pruning drops unsynthesized columns). Rows-only:
    // the generator isn't expressible in DuckDB SQL; determinism and
    // pushdown are spec'd in SynthSourceSpec.
    Q("src_synth_scan",
      (s, dir) => s.read.format("graft-synth")
        .option("rows", "20000").option("partitions", "8").load()
        .filter(col("doc_id") >= 1000 && col("doc_id") < 11000)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang"),
      None),

    // ------------------------------------------------------------------
    // 66: exact per-group variance from DECIMAL components — sums and
    // sums-of-squares are exact decimals (order-independent), converted
    // to doubles only for the final identical-formula arithmetic, then
    // floor-scaled. The streaming-friendly Welford/Chan Aggregator
    // (functions.WelfordVar, the typed-Aggregator API tier) is spec'd
    // against this exact formulation in CurationSpec.
    Q("q_variance_exact",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sx"),
          sum((col("l_quantity") * col("l_quantity")).cast("decimal(28,4)"))
            .cast("double").as("sxx"))
        .select(col("l_returnflag"), col("n"),
          expr("CAST(floor((sxx - sx * sx / n) / n * 1e6) AS BIGINT)").as("var_e6"))
        .orderBy("l_returnflag"),
      Some("""
        WITH g AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               CAST(floor((sxx - sx * sx / n) / n * 1e6) AS BIGINT) AS var_e6
        FROM g ORDER BY l_returnflag
      """)),

    // ------------------------------------------------------------------
    // 63: gaps and islands — consecutive same-value runs per user via the
    // two-row_number difference (grouping by VALUE runs, vs the TIME-gap
    // grouping of sessionize). Both windows shuffle once on user_id and
    // share the sort.
    Q("q_value_islands",
      (s, dir) => {
        val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wTyp = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        val ordered = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(wAll))
          .withColumn("rnt", row_number().over(wTyp))
        ordered
          .groupBy(col("user_id"), col("event_type"), (col("rn") - col("rnt")).as("grp"))
          .agg(count(lit(1)).as("run_len"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_runs"), max("run_len").as("longest_run"),
            sum("run_len").cast("bigint").as("n_events"))
          .orderBy("user_id")
      },
      Some("""
        WITH ordered AS (
          SELECT user_id, event_type, ts, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                 row_number() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS rnt
          FROM events),
        islands AS (
          SELECT user_id, event_type, rn - rnt AS grp, COUNT(*) AS run_len
          FROM ordered GROUP BY user_id, event_type, rn - rnt)
        SELECT user_id, COUNT(*) AS n_runs, max(run_len) AS longest_run,
               CAST(sum(run_len) AS BIGINT) AS n_events
        FROM islands GROUP BY user_id ORDER BY user_id
      """)),

    // ------------------------------------------------------------------
    // 64: schema evolution — union an old-schema batch with a new-schema
    // batch (added column), missing columns NULL-padded
    // (unionByName(allowMissingColumns), the schema-drift staple of
    // incremental ingestion).
    Q("t_schema_evolve",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val oldBatch = cust.filter(col("c_custkey") % 2 === 0)
          .select("c_custkey", "c_name")
        val newBatch = cust.filter(col("c_custkey") % 2 === 1)
          .select("c_custkey", "c_name", "c_mktsegment")
        oldBatch.unionByName(newBatch, allowMissingColumns = true)
          .orderBy("c_custkey")
      },
      Some("""
        WITH old AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
        new AS (SELECT c_custkey, c_name, c_mktsegment FROM customer
                WHERE c_custkey % 2 = 1)
        SELECT c_custkey, c_name, c_mktsegment FROM (
          SELECT c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_mktsegment FROM old
          UNION ALL SELECT c_custkey, c_name, c_mktsegment FROM new)
        ORDER BY c_custkey
      """)),

    // ------------------------------------------------------------------
    // 61: golden record / survivorship — field-level merge across a
    // duplicate cluster: per user, the latest NON-NULL observation of
    // each field (the MDM step after dedup identifies a cluster). One
    // nulls-last window per field with a total tiebreak (ts desc,
    // event_id desc) so the pick is deterministic on both engines —
    // max_by/arg_max null semantics differ between engines, an explicit
    // window does not.
    Q("t_golden_record",
      (s, dir) => {
        val src = Tables.events(s, dir).select(
          col("user_id"), col("ts"), col("event_id"),
          when(col("value") > 50, col("value")).as("v_opt"),
          when(col("event_type") =!= "view", col("event_type")).as("t_opt"))
        def latest(c: String, as: String) = {
          val w = Window.partitionBy("user_id").orderBy(
            col(c).isNull.asc, col("ts").desc, col("event_id").desc)
          src.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).select(col("user_id"), col(c).as(as))
        }
        latest("v_opt", "latest_value")
          .join(latest("t_opt", "latest_type"), "user_id")
          .join(src.groupBy("user_id").agg(count(lit(1)).as("n")), "user_id")
          .orderBy("user_id")
      },
      Some("""
        WITH src AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN value > 50 THEN value END AS v_opt,
                 CASE WHEN event_type <> 'view' THEN event_type END AS t_opt
          FROM events),
        lv AS (SELECT user_id, v_opt AS latest_value FROM src
               QUALIFY row_number() OVER (PARTITION BY user_id
                 ORDER BY (v_opt IS NULL), ts DESC, event_id DESC) = 1),
        lt AS (SELECT user_id, t_opt AS latest_type FROM src
               QUALIFY row_number() OVER (PARTITION BY user_id
                 ORDER BY (t_opt IS NULL), ts DESC, event_id DESC) = 1),
        n AS (SELECT user_id, COUNT(*) AS n FROM src GROUP BY user_id)
        SELECT user_id, latest_value, latest_type, n
        FROM lv JOIN lt USING (user_id) JOIN n USING (user_id)
        ORDER BY user_id
      """)),

    // ------------------------------------------------------------------
    // 62: JSON-lines sink + source round trip (same contract as
    // t_csv_roundtrip for the JSON path).
    Q("t_json_roundtrip",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_json_roundtrip-${ProcessHandle.current().pid()}"
        docs.write.mode("overwrite").json(tmp)
        s.read.schema(docs.schema).json(tmp)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("bigint").as("chars"),
            sum(conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long"))
              .cast("bigint").as("hsum"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, COUNT(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(sum(('0x' || substr(sha256(text), 1, 8))::UBIGINT) AS BIGINT) AS hsum
        FROM documents GROUP BY lang ORDER BY lang
      """)),

    // ------------------------------------------------------------------
    // 62b: ORC sink + source round trip (same contract as t_csv_roundtrip
    // / t_json_roundtrip) — the third on-disk format, exercising Spark's
    // vectorized ORC reader/writer; schema carried by the file, not
    // re-imposed like CSV/JSON. Oracle reads the parquet original: equal
    // per-group checksums prove the ORC hop lossless.
    Q("t_orc_roundtrip",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_roundtrip-${ProcessHandle.current().pid()}"
        docs.write.mode("overwrite").orc(tmp)
        s.read.orc(tmp)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("bigint").as("chars"),
            sum(conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long"))
              .cast("bigint").as("hsum"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, COUNT(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(sum(('0x' || substr(sha256(text), 1, 8))::UBIGINT) AS BIGINT) AS hsum
        FROM documents GROUP BY lang ORDER BY lang
      """)),

    // ------------------------------------------------------------------
    // 62c: z-order clustered rewrite + read-back (`ZOrder`): lineitem keys
    // Morton-interleaved into a 16-file layout, then queried through a
    // SECONDARY-dimension filter — the dim a lexicographic sort leaves
    // unclustered. Footer min/max selectivity in both dims is asserted in
    // ZOrderSpec; the oracle (same filter on the original table) proves
    // the clustered rewrite lossless and filter-transparent.
    Q("t_zorder_cluster",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_zorder-${ProcessHandle.current().pid()}"
        graft.operators.ZOrder.writeClustered(
          li, Seq("l_partkey", "l_suppkey"), tmp, numFiles = 16)
        s.read.parquet(tmp)
          .filter(col("l_suppkey").between(2, 7))
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_partkey")).cast("bigint").as("sum_pk"),
            Q.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_suppkey"))
      },
      Some("""
        SELECT l_suppkey, COUNT(*) AS n,
               CAST(SUM(l_partkey) AS BIGINT) AS sum_pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem WHERE l_suppkey BETWEEN 2 AND 7
        GROUP BY 1 ORDER BY l_suppkey
      """)),

    // ------------------------------------------------------------------
    // 59: record linkage / fuzzy match — blocked edit-distance self-join
    // (the ETL name-matching primitive). Blocking on a 16-char name
    // prefix bounds every block, so the within-block pair explosion is
    // capped and the levenshtein verify is distributed; no block, no
    // O(n²). Output: pair counts per distance.
    Q("t_fuzzy_match",
      (s, dir) => {
        // Explicit spread on the block key: the blocked frame is tiny in
        // BYTES but the within-block pair explosion is CPU-heavy — AQE
        // would coalesce it to a couple of tasks (measured 5.8 s vs
        // 1.3 s at sf0.1); the identical repartition on both sides also
        // co-partitions the self-join through one reused exchange.
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"),
            substring(col("c_name"), 1, 16).as("blk"))
          .repartition(32, col("blk"))
        c.as("a").join(c.as("b"),
            col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
          .select(levenshtein(col("a.c_name"), col("b.c_name")).as("dist"))
          .filter(col("dist") <= 1)
          .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
          .orderBy("dist")
      },
      Some("""
        WITH c AS (SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk FROM customer)
        SELECT levenshtein(a.c_name, b.c_name) AS dist, COUNT(*) AS n_pairs
        FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        GROUP BY 1 ORDER BY 1
      """)),

    // ------------------------------------------------------------------
    // 60: resample + forward fill — hourly per-user spine over the event
    // history with last-observation-carried-forward (gaps inherit the
    // previous hour's decimal-exact sum; hours before the first
    // observation stay NULL on both engines).
    Q("q_ffill_resample",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id") < 10)
        val bounds = Tables.events(s, dir).agg(
          date_trunc("HOUR", min(col("ts"))).as("lo"),
          date_trunc("HOUR", max(col("ts"))).as("hi"))
        val spine = ev.select(col("user_id")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("hour"))
          .agg(Q.dsum(col("value")).as("v"))
        spine.join(hourly, Seq("user_id", "hour"), "left")
          .withColumn("filled", last(col("v"), ignoreNulls = true).over(
            Window.partitionBy("user_id").orderBy("hour")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("user_id", "hour", "filled")
          .orderBy("user_id", "hour")
      },
      Some("""
        WITH b AS (SELECT CAST(min(date_trunc('hour', ts)) AS TIMESTAMP) AS lo,
                          CAST(max(date_trunc('hour', ts)) AS TIMESTAMP) AS hi FROM events),
        users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
        spine AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
                  FROM users, b),
        hourly AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                   FROM events WHERE user_id < 10 GROUP BY 1, 2)
        SELECT s.user_id, s.hour,
               last_value(h.v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM spine s LEFT JOIN hourly h ON h.user_id = s.user_id AND h.hour = s.hour
        ORDER BY s.user_id, s.hour
      """)),

    // ------------------------------------------------------------------
    // 58: correlated LATERAL subquery with per-group ORDER BY + LIMIT —
    // top-3 suppliers by balance per nation through the SQL surface
    // (DataFrame twin is q_window_rank's rank-filter shape).
    Q("q_lateral_topk",
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("lt_nation")
        Tables.supplier(s, dir).createOrReplaceTempView("lt_supplier")
        s.sql("""
          SELECT n.n_name, l.s_name, l.s_acctbal
          FROM lt_nation n,
          LATERAL (SELECT s_name, s_acctbal FROM lt_supplier s
                   WHERE s.s_nationkey = n.n_nationkey
                   ORDER BY s_acctbal DESC, s_name LIMIT 3) l
          ORDER BY n.n_name, l.s_acctbal DESC, l.s_name
        """)
      },
      Some("""
        SELECT n.n_name, l.s_name, l.s_acctbal
        FROM nation n,
        LATERAL (SELECT s_name, s_acctbal FROM supplier s
                 WHERE s.s_nationkey = n.n_nationkey
                 ORDER BY s_acctbal DESC, s_name LIMIT 3) l
        ORDER BY n.n_name, l.s_acctbal DESC, l.s_name
      """)),

    // ------------------------------------------------------------------
    // 60: the CURATION pipeline composed end-to-end — html strip → NFC
    // canonicalize → quality gate → exact dedup (min-id survivor) →
    // chunking → per-source stats. Each stage is an operator verified on
    // its own (x_html_strip, x_unicode_nfc, x_quality_filter,
    // d_dedup_exact, x_doc_chunk); this registers their COMPOSITION —
    // what a training-data run actually executes — and every stage is
    // SQL-expressible, so the whole DAG hash-checks. Plan shape: narrow
    // projection chain + one window (dedup) + one explode (source rides
    // along — no join-back) + the final per-source agg; the only
    // data-sized shuffle is the dedup window's, at any corpus size.
    Q("x_curation_e2e",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val gated = graft.operators.TextClean.cleanGate(
          docs.select(col("doc_id"), col("source"), col("text")), "text")
        val surv = gated
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("clean")).orderBy(col("doc_id"))))
          .filter(col("rk") === 1)
          .select("doc_id", "source", "clean")
        Pack.docChunk(surv, "doc_id", "clean", keep = Seq("source"))
          .groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_len")).as("n_chars"))
          .orderBy("source")
      },
      Some("""
        WITH cleaned AS (
          SELECT doc_id, source,
                 regexp_replace(nfc_normalize(
                   trim(regexp_replace(
                     replace(replace(replace(replace(replace(replace(
                       regexp_replace(text, '<[^>]*>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                     '[ \t\n\r]+', ' ', 'g'))),
                   '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g') AS clean
          FROM documents),
        gated AS (
          SELECT doc_id, source, clean FROM cleaned
          WHERE len(string_split_regex(trim(clean), '\s+')) >= 10
            AND round((length(clean) - length(regexp_replace(clean, '[.,!?;:]', '', 'g')))
                      / CAST(nullif(length(clean), 0) AS DOUBLE), 6) < 0.3),
        surv AS (
          SELECT doc_id, source, clean FROM (
            SELECT *, row_number() OVER (PARTITION BY clean ORDER BY doc_id) AS rk
            FROM gated) WHERE rk = 1),
        chunks AS (
          SELECT doc_id,
                 len(substr(clean, CAST(ci * 150 + 1 AS INT), 200)) AS chunk_len
          FROM (SELECT doc_id, clean,
                       unnest(range(0, (greatest(length(clean), 1) - 1) // 150 + 1)) AS ci
                FROM surv))
        SELECT s.source,
               COUNT(DISTINCT s.doc_id) AS n_docs,
               COUNT(*) AS n_chunks,
               CAST(SUM(c.chunk_len) AS BIGINT) AS n_chars
        FROM chunks c JOIN surv s USING (doc_id)
        GROUP BY s.source ORDER BY s.source
      """))
  )
}
