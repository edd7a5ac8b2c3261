package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — logical node + strategy +
  * physical sort-merge exec (the whole-operator tier of the extension
  * ladder; SURVEY.md §4).
  *
  * Semantics: for every left row, attach the LAST right row with the same
  * key whose timestamp is ≤ the left timestamp (right columns null when no
  * such row) — the standard trades⋈quotes as-of join.
  *
  * Physical execution: both sides hash-cluster on the key and sort by
  * (key, ts) — EnsureRequirements inserts the exchanges/sorts — then one
  * streaming merge pass per partition with O(1) state (the last matching
  * right row). No window buffering, no union trick, no range explosion:
  * at 100 TB each side shuffles exactly once and the merge is linear.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy turning the logical node into the physical exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both sides on the join key. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** Within partitions, sort by (key, ts) so one merge pass suffices. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder.apply(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder.apply(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  /** The merge preserves the left child's hash clustering — report it so
    * downstream key-clustered operators (groupBy/window/joins on the same
    * key) do not pay a second exchange.
    */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = Seq(
    SortOrder.apply(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
    SortOrder.apply(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrdering = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.size
    // Input schema must carry the nullable-adjusted right attributes —
    // binding against the original non-nullable ones makes the projection
    // skip null checks and read null numerics as 0.
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      // Buffered right iterator with one-row lookahead. Rows with a null
      // key or null ts can never match (SQL join semantics) and are
      // skipped on every advance — null ts sorts at the head of its KEY
      // group, not the partition, so a one-time initial drain is not
      // enough.
      var rHead: InternalRow = null
      def advanceRight(): Unit = {
        rHead = if (rIter.hasNext) rIter.next() else null
        while (rHead != null && (rKey.eval(rHead) == null || rTs.eval(rHead) == null))
          rHead = if (rIter.hasNext) rIter.next() else null
      }
      advanceRight()

      // Last right row consumed whose key matches `lastKey`.
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTs.eval(lRow)
        if (lk == null || lt == null) {
          // Null left key/ts matches nothing; keep the row, null-padded.
          proj(joined(lRow, nullRight))
        } else {
          // Consume right rows that are usable for this (or an earlier)
          // left row: key strictly before, or same key with ts <= left ts.
          var continue = rHead != null
          while (continue) {
            val rk = rKey.eval(rHead)
            val c = keyOrdering.compare(rk, lk)
            if (c < 0) {
              advanceRight()
            } else if (c == 0 && tsOrdering.compare(rTs.eval(rHead), lt) <= 0) {
              lastMatch = rHead.copy()
              // Re-evaluate the key from the COPIED row: rHead's backing
              // memory is owned by the upstream sorter and is reused after
              // advanceRight() — retaining rk (e.g. a UTF8String view)
              // would compare against garbage later.
              lastMatchKey = rKey.eval(lastMatch)
              advanceRight()
            } else {
              continue = false
            }
            if (rHead == null) continue = false
          }
          val matches = lastMatch != null && keyOrdering.compare(lastMatchKey, lk) == 0
          proj(joined(lRow, if (matches) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
