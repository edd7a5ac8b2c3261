package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup
import graft.sources.Tables

/** The Bloom-gated incremental exact dedup must be byte-equal to the
  * plain anti-join (no false negatives by construction; false positives
  * removed by the confirm join), while the corpus side never shuffles —
  * its only appearances are the treeAggregated Bloom build and a
  * broadcast-probe scan.
  */
class BloomGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("bloomGate equals the plain anti-join and keeps the corpus unshuffled") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    // Mostly-new rows plus a slice ALREADY IN the corpus, so the gate
    // must provably drop members and keep non-members.
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .unionByName(corpus.filter(col("doc_id") % 9 === 1))

    // Tiny filter (high fpp) to force false positives through the
    // confirm join; exactness must survive them.
    val gated = TextDedup.bloomGate(corpus, batch, "h",
      expectedItems = 64, fpp = 0.5)
    val plain = batch.join(corpus.select("h"), Seq("h"), "left_anti")

    val g = gated.select("doc_id").collect().map(_.getLong(0)).sorted
    val p = plain.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(g.sameElements(p), s"gate=${g.take(20).mkString(",")} plain=${p.take(20).mkString(",")}")
    // The batch contains duplicated texts (the corpus has exact dups), so
    // the gate must actually drop something — and keep something.
    assert(g.length < batch.count())
    assert(g.nonEmpty)

    // Plan shape: both joins broadcast the SMALL side; no shuffle
    // exchange anywhere (the corpus reaches the confirm join as a plain
    // scan probed by the broadcast candidate set).
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle:\n$plan")

    // The probe is a native codegen'd expression, not a Scala UDF: the
    // batch-side filter must stay inside whole-stage codegen (r9 ADVICE
    // — the UDF probe broke the span for no semantic reason). The probe
    // lands as a bloommightcontain data filter directly on the scan.
    assert(!plan.contains("UDF"), s"Scala UDF survived in the probe:\n$plan")
    assert(plan.contains("bloommightcontain"),
      s"no native BloomMightContain probe in:\n$plan")
    // doGenCode, not CodegenFallback — the span is unbroken by type.
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.BloomMightContain]))
    // The generated code actually compiles (a doGenCode typo would fall
    // back to interpreted mode at runtime and silently eat the win):
    // evaluate the probe standalone inside a fresh codegen'd projection.
    val probed = batch.select(col("h"))
      .filter(org.apache.spark.sql.GraftBridge.column(
        graft.functions.BloomMightContain(
          org.apache.spark.sql.GraftBridge.expression(col("h")),
          spark.sparkContext.broadcast(
            corpus.stat.bloomFilter("h", 64, 0.5)))))
    val fallbackConf = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(fallbackConf)
    try {
      spark.conf.set(fallbackConf, "false") // a codegen bug now THROWS
      assert(probed.count() > 0)
    } finally spark.conf.set(fallbackConf, prev)
  }

  test("q_bloom_join equals the plain semi join with the probe on the scan") {
    val df = SparkEntry.queries("q_bloom_join")(spark, sfDir)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // Unpruned truth: plain broadcast semi join, no bloom stage.
    val sel = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 480000.0)
      .select(col("o_orderkey").as("l_orderkey"))
    val plain = Tables.lineitem(spark, sfDir)
      .join(sel, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sameElements(plain))
    assert(rows.nonEmpty)
    // Plan: the bloom probe is a data filter feeding a broadcast semi
    // join — the fact side is never shuffled (the only exchanges are
    // broadcasts and the final agg's key exchange).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloommightcontain"), s"probe missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"semi join must broadcast the dim side:\n$plan")
  }
}
