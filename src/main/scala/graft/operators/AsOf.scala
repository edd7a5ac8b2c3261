package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions.col

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** User API for the native as-of join (see graft.plans.AsOfJoin).
  *
  * `left` rows gain the columns of the last `right` row with the same key
  * whose `rightTs` ≤ `leftTs` (nulls when none). Right columns are
  * re-aliased first, which both avoids name clashes and gives the right
  * side fresh expression ids (required for self-joins).
  */
object AsOf {

  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightSuffix: String = "_r"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val renamed = right.select(
      right.columns.map(c => col(c).as(c + rightSuffix)).toIndexedSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = renamed.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark, AsOfJoinPlan(
      lp, rp,
      attr(lp, leftKey), attr(rp, rightKey + rightSuffix),
      attr(lp, leftTs), attr(rp, rightTs + rightSuffix)))
  }
}
