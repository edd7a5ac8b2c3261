package graft

import org.apache.spark.sql.functions._

/** Dev probe (test scope, not shipped): stage-level wall timings for the
  * d_dedup_ppjoin direct pipeline at a given SF dir. Replicates the stage
  * BOUNDARIES of TextDedup.ngramJaccardJoin's fast path (each stage ends
  * at an action/materialization) so the 3.7 s sf0.1 constant can be
  * attributed before it's attacked.
  * Run: sbt "Test/runMain graft.PpjoinPhases /root/testdata/sf0.1"
  */
object PpjoinPhases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.harness(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.operators.TextDedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ppjoin-phase] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // Warm pass (codegen + parquet footers), then per-stage timings.
    t("warm full query") {
      TextDedup.ngramJaccardJoin(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", 3, 0.8)
        .groupBy().agg(count(lit(1))).collect()
    }
    t("steady full query") {
      TextDedup.ngramJaccardJoin(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", 3, 0.8)
        .groupBy().agg(count(lit(1))).collect()
    }
    // Stage replication (same exprs as TextDedup, same checkpoint spots).
    val docs = graft.sources.Tables.documents(spark, dir)
    val sets = t("sets checkpoint") {
      graft.operators.Materialize(
        docs.select(col("doc_id").as("id"),
          graft.operators.TextDedup.wordShingles(col("text"), 3).as("sh"))
          .withColumn("sz", size(col("sh"))))
    }
    t("collapseWorthwhile probe") {
      val dp2 = sets
        .select(xxhash64(sort_array(col("sh"))).as("f1"),
          xxhash64(lit("graft.setfp2"), sort_array(col("sh"))).as("f2"))
        .groupBy("f1", "f2").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L))).head()
      dp2
    }
    val hsets = t("hsets checkpoint") {
      graft.operators.Materialize(sets.select(col("id"),
        sort_array(array_distinct(transform(col("sh"), s =>
          struct(xxhash64(s).as("h"), xxhash64(lit("graft.vfy2"), s).as("h2")))))
          .as("fp"))
        .withColumn("sz", size(col("fp"))))
    }
    val exploded = hsets.select(col("id"), col("sz"), explode(col("fp")).as("e"))
      .select(col("id"), col("sz"), col("e.h").as("h"), col("e.h2").as("h2"))
    val dfTab = exploded.groupBy("h", "h2").agg(count(lit(1)).as("df_"))
    t("dfTab count action") { dfTab.count() }
    val pref = exploded.join(dfTab, Seq("h", "h2"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df_"), col("h"), col("h2"))))
          .as("sorted"),
        first(col("sz")).as("sz"))
      .select(col("id"), col("sz"),
        posexplode(slice(col("sorted"), lit(1),
          (col("sz") - ceil(col("sz") * 0.8) + 1).cast("int")))
          .as(Seq("pos", "a")))
    t("prefix rows count action") { pref.count() }
    val occ = pref
      .groupBy(col("a").as("anchor"))
      .agg(collect_list(struct(col("id"), col("sz"), col("pos"))).as("docs"))
      .select(col("anchor"), explode(org.apache.spark.sql.GraftBridge.column(
        graft.functions.PrunedPairCombos(
          org.apache.spark.sql.GraftBridge.expression(col("docs")), 0.8))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("anchor"))
    val canon = t("canon checkpoint+count") {
      val c = graft.operators.Materialize(occ.groupBy("id_a", "id_b")
        .agg(min(col("anchor")).as("anchor")))
      c.count(); c
    }
    t("direct verify + agg") {
      val packed1 = hsets.select(col("id"), flatten(transform(col("fp"),
        e => array(e.getField("h"), e.getField("h2")))).as("fpl"))
      canon
        .join(packed1.select(col("id").as("id_a"), col("fpl").as("fpl_a")), Seq("id_a"))
        .join(packed1.select(col("id").as("id_b"), col("fpl").as("fpl_b")), Seq("id_b"))
        .select(org.apache.spark.sql.GraftBridge.column(graft.functions.PackedJaccard(
          org.apache.spark.sql.GraftBridge.expression(col("fpl_a")),
          org.apache.spark.sql.GraftBridge.expression(col("fpl_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .groupBy().agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
