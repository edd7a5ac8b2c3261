package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark has no native range-join strategy
  * (Databricks' range-join hint is proprietary); the scalable public
  * technique is bucketing: quantize time into `bucketSeconds` buckets,
  * explode each interval onto the buckets it covers, equi-join on bucket,
  * then apply the exact range predicate. The shuffle is an equi-join on
  * (bucket) instead of an O(n·m) inequality join; bucket width trades
  * duplication factor vs bucket fan-out.
  */
object RangeJoin {

  /** Join point events to intervals: rows (point ⋈ interval) where
    * `start <= pointTs < end`. Interval columns are prefixed to avoid
    * collisions. Both inputs shuffle once, on the bucket key.
    */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    val b = lit(bucketSeconds)
    val p = points.withColumn("__bucket", (unix_timestamp(col(pointTs)) / b).cast("long"))
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(
          (unix_timestamp(col(startCol)) / b).cast("long"),
          (unix_timestamp(col(endCol)) / b).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bucket")
  }
}
