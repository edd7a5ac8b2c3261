package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Shuffle-strategy helpers for the 100 TB posture (SURVEY.md §6).
  *
  *  - Bucketed tables: co-located joins with NO exchange on either side —
  *    the only way to repeatedly join two huge fact tables without paying
  *    the shuffle every query.
  *  - Salted joins: bound the largest reducer when a join key is skewed
  *    (AQE skew-join splits post-hoc; salting prevents the hot partition
  *    from existing at all and also covers aggregations).
  */
object ScaleJoins {

  /** Write `df` as a bucketed, sorted table. Subsequent equi-joins on
    * `keys` between tables bucketed the same way plan as SortMergeJoin
    * with zero Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketing tables (no shuffle on either side). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Salted inner equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, saltFactor); the small side is replicated across all
    * salts. The hot key's rows spread over `saltFactor` reducers.
    * `rand(seed)` keeps runs reproducible.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      saltFactor: Int, seed: Long = 42L): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(seed) * saltFactor).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k rows per group WITHOUT a window sort: custom TopKAgg
    * aggregate (bounded map-side heaps; only k rows per group per
    * partition shuffle). Returns (groupCols..., payload, score, rk).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      payloadCol: String, k: Int): DataFrame = {
    val agg = GraftBridge.column(
      TopKAgg(
        GraftBridge.expression(col(scoreCol).cast("double")),
        GraftBridge.expression(col(payloadCol).cast("long")),
        k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("topk"))
      .select(groupCols.map(col) :+ posexplode(col("topk")).as(Seq("pos", "entry")): _*)
      .select(groupCols.map(col) :+
        col("entry.payload").as(payloadCol) :+
        col("entry.score").as(scoreCol) :+
        (col("pos") + 1).as("rk"): _*)
  }

  /** Salted two-phase aggregation: partial agg on (key, salt), then final
    * agg on key — caps the biggest reducer for heavy-hitter keys. `aggs`
    * must be decomposable (sum/count/min/max).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).cast("double").as("sum_value"), sum(col("__c")).as("n"))
}
