package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.PlanBridge

/** Native INTERVAL (range) JOIN — the second whole-operator extension,
  * generalizing the AsofJoinExec merge pattern (the round-2 verdict's
  * "native interval-join exec" ask): a `LogicalPlan` node, a planner
  * `Strategy`, and a physical `SparkPlan` registered through
  * `SparkSessionExtensions` (GraftExtensions).
  *
  * Semantics (inner): every (left, right) pair with equal keys and
  * `left.ts <= right.ts < left.ts + windowMicros` — the "events within
  * the next W" primitive behind sessionization, self-correlation, and
  * feature windows. Identical to the bucketed-rewrite formulation in
  * JoinsAdvanced.joinInterval and the oracle's
  * `b.ts >= a.ts AND b.ts < a.ts + INTERVAL ...` theta join.
  *
  * Why a physical operator: the bucketed rewrite is skew-safe but pays a
  * 2× probe-row explode (own + next bucket) plus the in-bucket filter;
  * the naive theta join materializes every same-key pair. This operator
  * hash-partitions both sides on the key (requiredChildDistribution, so
  * EnsureRequirements co-partitions them like any sort-merge join), sorts
  * within partitions by (key, ts), and runs a SLIDING-BUFFER merge: both
  * lower and upper window bounds are monotone in the left's sort order,
  * so each right row enters and leaves the buffer exactly once —
  * O(n + m + matches) work and O(max rows in any W span) memory per
  * partition, each side shuffled exactly once, no explode.
  *
  * Key/time columns are restricted to long-backed types (integral keys,
  * timestamp ts — micros-as-long in InternalRow), the same contract as
  * AsofJoinExec; windowMicros is a plan-time constant.
  */
case class IntervalJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    windowMicros: Long)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: IntervalJoinNode → IntervalJoinExec. Injected via
  * `ext.injectPlannerStrategy` in GraftExtensions. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinNode(l, r, lk, lt, rk, rt, w) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, w) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    windowMicros: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Same co-partitioning contract as sort-merge join: equal key values
  // hash to the same partition index on both sides, so zipPartitions
  // aligns partition-wise.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "interval-join key attributes must come from the child plans")
    val w = windowMicros
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      new Iterator[InternalRow] {
        // Sliding buffer of right rows for the CURRENT left key, sorted by
        // ts (right arrives sorted). Rows are copied on entry because the
        // child sorter reuses row memory across next() calls.
        private val buf = new java.util.ArrayDeque[InternalRow]()
        private var bufKey: Long = 0L
        private var haveBufKey: Boolean = false
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var curLeft: InternalRow = null
        private var emit: java.util.Iterator[InternalRow] = null

        /** Position the buffer for the next left row; true if it has any
          * matches (inner join: match-less left rows are skipped). */
        private def advanceLeft(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = l.getLong(lkIdx)
            val lts = l.getLong(ltIdx)
            val hi = lts + w // exclusive upper bound
            if (!haveBufKey || bufKey != lk) {
              buf.clear(); bufKey = lk; haveBufKey = true
            }
            // evict rows below the (monotone) lower bound
            while (!buf.isEmpty && buf.peekFirst().getLong(rtIdx) < lts)
              buf.pollFirst()
            // pull right rows: skip earlier keys / below-lower-bound rows
            // (left is sorted, so no later left row can want them either),
            // buffer rows inside [lts, hi), stop at the first row at/past
            // hi or of a later key — it stays as the lookahead head
            var continue = true
            while (continue && rHead != null) {
              val rk = rHead.getLong(rkIdx)
              if (rk < lk) {
                rHead = if (rIter.hasNext) rIter.next().copy() else null
              } else if (rk == lk) {
                val rts = rHead.getLong(rtIdx)
                if (rts < lts) {
                  rHead = if (rIter.hasNext) rIter.next().copy() else null
                } else if (rts < hi) {
                  buf.addLast(rHead)
                  rHead = if (rIter.hasNext) rIter.next().copy() else null
                } else continue = false
              } else continue = false
            }
            if (!buf.isEmpty) {
              curLeft = l.copy()
              emit = buf.iterator()
              return true
            }
          }
          false
        }

        override def hasNext: Boolean =
          (emit != null && emit.hasNext) || advanceLeft()
        override def next(): InternalRow = {
          if ((emit == null || !emit.hasNext) && !advanceLeft())
            throw new NoSuchElementException
          project(joined(curLeft, emit.next()))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry point: `IntervalJoin.interval(a, b, ...)`. Attribute
  * lookup by name over the ANALYZED child plans keeps the node resolved. */
object IntervalJoin {
  def interval(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String,
      windowMicros: Long): DataFrame = {
    val lp = PlanBridge.logicalPlan(leftDf)
    val rp = PlanBridge.logicalPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    PlanBridge.dataFrame(leftDf.sparkSession,
      IntervalJoinNode(lp, rp,
        attr(lp, leftKey), attr(lp, leftTs),
        attr(rp, rightKey), attr(rp, rightTs), windowMicros))
  }
}
