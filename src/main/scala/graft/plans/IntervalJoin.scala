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
        // ts (right arrives sorted). Rows are copied ON KEEP (buffer
        // entry), not on read (round 13: copy-on-read paid an
        // allocation+memcpy for every skipped row); the sorter's reused
        // row memory is only invalidated by our next rIter.next(), so the
        // uncopied lookahead is safe. NULL key/ts rows are skipped on
        // both sides — SQL join semantics; a NULL slot would otherwise
        // read as getLong 0 and silently bucket as key 0 (round-13
        // review).
        private val buf = new java.util.ArrayDeque[InternalRow]()
        private var bufKey: Long = 0L
        private var haveBufKey: Boolean = false
        private def nextRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rkIdx) && !r.isNullAt(rtIdx)) return r
          }
          null
        }
        private var rHead: InternalRow = nextRight()
        private var curLeft: InternalRow = null
        private var emit: java.util.Iterator[InternalRow] = null

        /** Position the buffer for the next left row; true if it has any
          * matches (inner join: match-less left rows are skipped). */
        private def advanceLeft(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            if (!l.isNullAt(lkIdx) && !l.isNullAt(ltIdx)) {
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
                  rHead = nextRight()
                } else if (rk == lk) {
                  val rts = rHead.getLong(rtIdx)
                  if (rts < lts) {
                    rHead = nextRight()
                  } else if (rts < hi) {
                    buf.addLast(rHead.copy()) // copy-on-keep
                    rHead = nextRight()
                  } else continue = false
                } else continue = false
              }
              if (!buf.isEmpty) {
                curLeft = l.copy()
                emit = buf.iterator()
                return true
              }
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
    import EntryChecks._
    requireDisjointOutputs("interval", lp, rp)
    require(windowMicros > 0,
      s"interval windowMicros must be positive, got $windowMicros " +
        "(a non-positive window silently matches nothing)")
    val (lk, lt) = (attr(lp, leftKey), attr(lp, leftTs))
    val (rk, rt) = (attr(rp, rightKey), attr(rp, rightTs))
    requireLongBacked(lk, "interval", "left key"); requireLongBacked(lt, "interval", "left ts")
    requireLongBacked(rk, "interval", "right key"); requireLongBacked(rt, "interval", "right ts")
    PlanBridge.dataFrame(leftDf.sparkSession,
      IntervalJoinNode(lp, rp, lk, lt, rk, rt, windowMicros))
  }
}
