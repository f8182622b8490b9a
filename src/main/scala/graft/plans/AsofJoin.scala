package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.PlanBridge

/** Native AS-OF JOIN — the custom whole-operator path (SURVEY §4.3) the
  * group-by-arg-max formulation deferred: a `LogicalPlan` node, a planner
  * `Strategy`, and a physical `SparkPlan` registered through
  * `SparkSessionExtensions` (GraftExtensions).
  *
  * Semantics: for every left row, the LAST right row of the same user with
  * `right.ts <= left.ts` under the (ts, tieBreak) ordering — i.e. arg-max
  * of (ts, tieBreak), identical to the `max(struct(...))` formulation in
  * JoinsAdvanced.joinAsof and to the oracle's
  * `row_number() OVER (ORDER BY ts DESC, key DESC) = 1`. Inner flavor:
  * left rows with no match are dropped.
  *
  * Why a physical operator: the arg-max formulation materializes every
  * (event, earlier-order) candidate pair into the join before the
  * aggregate collapses them — O(matches) rows through the shuffle. This
  * operator's per-partition merge touches each input row ONCE: both sides
  * hash-partition on the user key (declared via requiredChildDistribution,
  * so EnsureRequirements co-partitions them like any sort-merge join) and
  * sort within partitions by (user, ts) — the shuffle carries each side
  * exactly once, O(n+m) total, the true 100 TB as-of shape.
  *
  * Key columns are restricted to long-backed types (integral keys,
  * timestamp ts — all micros-as-long in InternalRow), which covers the
  * engine's surface; the general form would thread an interpreted
  * ordering instead of primitive compares.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftUser: Attribute,
    leftTs: Attribute,
    rightUser: Attribute,
    rightTs: Attribute,
    rightTie: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsofJoinNode → AsofJoinExec. Injected via
  * `ext.injectPlannerStrategy` in GraftExtensions. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lu, lt, ru, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lu, lt, ru, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftUser: Attribute,
    leftTs: Attribute,
    rightUser: Attribute,
    rightTs: Attribute,
    rightTie: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Both children clustered on the user key: EnsureRequirements inserts
  // hash exchanges with a common partition count, and equal user values
  // hash to the same partition index on both sides (hash is value-based),
  // so zipPartitions aligns — the same contract sort-merge join relies on.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftUser)) :: ClusteredDistribution(Seq(rightUser)) :: Nil

  // In-partition merge order; the right's (ts, tie) ordering makes
  // "last row seen with ts <= left.ts" the (ts, tie) arg-max.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftUser, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightUser, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val luIdx = left.output.indexWhere(_.exprId == leftUser.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val ruIdx = right.output.indexWhere(_.exprId == rightUser.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(luIdx >= 0 && ltIdx >= 0 && ruIdx >= 0 && rtIdx >= 0,
      "as-of key attributes must come from the child plans")
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      new Iterator[InternalRow] {
        // one-row lookahead on the right; rows are copied on read because
        // the child sorter reuses row memory across next() calls
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var lastMatch: InternalRow = null
        private var lastMatchUser: Long = 0L
        private var haveMatchUser: Boolean = false
        private var nextRow: InternalRow = null

        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lu = l.getLong(luIdx)
            val lts = l.getLong(ltIdx)
            // consume right rows at or before (lu, lts)
            var continue = true
            while (continue && rHead != null) {
              val ru = rHead.getLong(ruIdx)
              if (ru < lu) {
                // left is sorted by user: no future left row wants ru
                rHead = if (rIter.hasNext) rIter.next().copy() else null
              } else if (ru == lu && rHead.getLong(rtIdx) <= lts) {
                lastMatch = rHead // already a copy
                lastMatchUser = ru
                haveMatchUser = true
                rHead = if (rIter.hasNext) rIter.next().copy() else null
              } else {
                continue = false
              }
            }
            if (haveMatchUser && lastMatchUser == lu) {
              nextRow = project(joined(l, lastMatch))
              return true
            }
            // inner as-of: unmatched left rows are dropped
          }
          false
        }

        override def hasNext: Boolean = nextRow != null || advance()
        override def next(): InternalRow = {
          if (nextRow == null && !advance()) throw new NoSuchElementException
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry point: `AsofJoin.asof(events, orders, ...)`. Attribute
  * lookup by name over the ANALYZED child plans keeps the node resolved. */
object AsofJoin {
  def asof(
      leftDf: DataFrame, rightDf: DataFrame,
      leftUser: String, leftTs: String,
      rightUser: String, rightTs: String, rightTie: String): DataFrame = {
    val lp = PlanBridge.logicalPlan(leftDf)
    val rp = PlanBridge.logicalPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    PlanBridge.dataFrame(leftDf.sparkSession,
      AsofJoinNode(lp, rp,
        attr(lp, leftUser), attr(lp, leftTs),
        attr(rp, rightUser), attr(rp, rightTs), attr(rp, rightTie)))
  }
}
