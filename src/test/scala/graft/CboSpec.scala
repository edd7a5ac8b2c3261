package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer posture: with column statistics (`ANALYZE TABLE
  * ... FOR COLUMNS`) and `spark.sql.cbo.enabled`, a selective filter on a
  * big dimension shrinks its SIZE ESTIMATE below the broadcast threshold
  * and the join plans as BroadcastHashJoin at COMPILE time — no shuffle of
  * the fact side. Without stats the filter's estimate stays at file size
  * and the same query plans as a shuffle join. At warehouse scale this
  * static flip is what keeps repeated dim-filter joins off the exchange
  * path (AQE can only rescue it AFTER the dim was shuffled once).
  */
class CboSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def initialPlan(viewSql: String): String = {
    val df = spark.sql(viewSql)
    df.queryExecution.sparkPlan.toString
  }

  test("column stats + CBO flip a selective dim join to broadcast") {
    import spark.implicits._
    val dim = spark.range(300000L)
      .select(col("id").as("k"), (col("id") % 100).cast("int").as("cat"),
        concat(lit("payload-padding-padding-"), col("id")).as("payload"))
    dim.write.mode("overwrite").format("parquet").saveAsTable("graft_cbo_dim")
    spark.range(2000000L).select(col("id").as("k"), (col("id") * 7 % 1000).as("v"))
      .write.mode("overwrite").format("parquet").saveAsTable("graft_cbo_fact")

    val q =
      """SELECT f.k, f.v, d.payload
        |FROM graft_cbo_fact f JOIN graft_cbo_dim d ON f.k = d.k
        |WHERE d.cat = 5""".stripMargin

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // Dim parquet is a few MB; 512 KiB keeps the UNFILTERED dim (and the
      // stats-less filtered estimate, which inherits the scan size) above
      // the bar while the 1/ndv-selective filtered estimate lands below.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)

      val before = initialPlan(q)
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected a shuffle join without stats:\n$before")

      spark.sql("ANALYZE TABLE graft_cbo_dim COMPUTE STATISTICS FOR COLUMNS k, cat, payload")
      val after = initialPlan(q)
      assert(after.contains("BroadcastHashJoin"),
        s"expected a broadcast join after ANALYZE:\n$after")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_cbo_dim")
      spark.sql("DROP TABLE IF EXISTS graft_cbo_fact")
    }
  }
}
