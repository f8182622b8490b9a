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
        // One-row lookahead on the right. Rows are NOT copied on read
        // (round 13: the old copy-on-read paid an allocation+memcpy for
        // every discarded row — the skip branches below throw most rows
        // away on a right-heavy input); the sorter's reused row memory is
        // only invalidated by OUR next rIter.next(), so holding rHead
        // uncopied across left steps is safe, and the one row we KEEP
        // (lastMatch) is copied at the keep site. NULL key/ts rows are
        // skipped on both sides — SQL join semantics (NULL matches
        // nothing), identical to the equijoin/arg-max oracle which drops
        // NULL keys; without the guard a NULL slot reads as getLong 0 and
        // silently joins as "user 0" (round-13 review).
        private def nextRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(ruIdx) && !r.isNullAt(rtIdx)) return r
          }
          null
        }
        private var rHead: InternalRow = nextRight()
        private var lastMatch: InternalRow = null
        private var lastMatchUser: Long = 0L
        private var haveMatchUser: Boolean = false
        private var nextRow: InternalRow = null

        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            if (!l.isNullAt(luIdx) && !l.isNullAt(ltIdx)) {
              val lu = l.getLong(luIdx)
              val lts = l.getLong(ltIdx)
              // consume right rows at or before (lu, lts)
              var continue = true
              while (continue && rHead != null) {
                val ru = rHead.getLong(ruIdx)
                if (ru < lu) {
                  // left is sorted by user: no future left row wants ru
                  rHead = nextRight()
                } else if (ru == lu && rHead.getLong(rtIdx) <= lts) {
                  lastMatch = rHead.copy() // copy-on-keep
                  lastMatchUser = ru
                  haveMatchUser = true
                  rHead = nextRight()
                } else {
                  continue = false
                }
              }
              if (haveMatchUser && lastMatchUser == lu) {
                nextRow = project(joined(l, lastMatch))
                return true
              }
            }
            // inner as-of: unmatched left rows (and NULL-key rows) drop
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
    import EntryChecks._
    requireDisjointOutputs("asof", lp, rp)
    val (lu, lt) = (attr(lp, leftUser), attr(lp, leftTs))
    val (ru, rt) = (attr(rp, rightUser), attr(rp, rightTs))
    // the raw-read slots; the tie column is only a SortOrder (any
    // orderable type works there)
    requireLongBacked(lu, "asof", "left key"); requireLongBacked(lt, "asof", "left ts")
    requireLongBacked(ru, "asof", "right key"); requireLongBacked(rt, "asof", "right ts")
    PlanBridge.dataFrame(leftDf.sparkSession,
      AsofJoinNode(lp, rp, lu, lt, ru, rt, attr(rp, rightTie)))
  }
}
