package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.PlanBridge

/** Native per-key TOP-K — the third whole-operator extension (after
  * AsofJoinExec and IntervalJoinExec), and the one with a PARTIAL phase:
  * like partial aggregation, per-key top-k is a semilattice reduction
  * (top-k of a union = top-k of the per-part top-ks), so each map task
  * first reduces its partition to ≤ k rows per LOCAL key with bounded
  * heaps, and only those survivors shuffle. The window-function
  * formulation (`row_number() OVER (...) <= k`, win_topk) must shuffle
  * EVERY row and fully sort each partition; this operator shuffles
  * ≤ k·(distinct keys per map task) rows and never sorts more than k
  * per key — at 100 TB, the difference between moving the fact table
  * and moving the report.
  *
  * Contract (concrete long/double-backed types, like the other native
  * execs): key integral (long-backed), order DOUBLE descending, tie
  * integral ascending — `ORDER BY ord DESC, tie ASC`, the §2.Z.6
  * deterministic-ties rule baked into the operator. Memory per task is
  * O(distinct local keys × k) rows (the partial phase's working set —
  * a sort-based fallback would spill; documented trade-off, same class
  * as hash aggregation's).
  */
case class TopKPerKeyNode(
    child: LogicalPlan,
    key: Attribute,
    ord: Attribute,
    tie: Attribute,
    k: Int)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(c, key, ord, tie, k) =>
      val partial = PartialTopKExec(planLater(c), key, ord, tie, k)
      FinalTopKExec(partial, key, ord, tie, k) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap reduction: per key keep the k best rows under
  * (ord DESC, tie ASC). The heap dequeues the WORST kept row first, so a
  * better candidate replaces it in O(log k). */
private[plans] object TopKHeaps {
  type Entry = (Double, Long, InternalRow)
  // PriorityQueue dequeues its ordering's MAX; rank the worst row highest:
  // smaller ord is worse; on equal ord, larger tie is worse.
  private val worstFirst: Ordering[Entry] = new Ordering[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Reduce an iterator to ≤ k rows per key; emit survivors best-first
    * per key (the final phase relies on that order, the partial phase
    * doesn't care). */
  def reduce(
      rows: Iterator[InternalRow],
      kIdx: Int, oIdx: Int, tIdx: Int, k: Int): Iterator[InternalRow] = {
    val heaps = new java.util.HashMap[Long, scala.collection.mutable.PriorityQueue[Entry]]()
    rows.foreach { r =>
      // getLong/getDouble on a NULL slot returns an undefined primitive,
      // not an error — the operator defines no NULL ordering, so corrupt
      // results must be impossible: reject actual NULLs loudly. (Parquet
      // schemas are nullable even for null-free data, so this cannot be a
      // static check at the topK entry point.)
      if (r.isNullAt(kIdx) || r.isNullAt(oIdx) || r.isNullAt(tIdx))
        throw new IllegalArgumentException(
          "topK: NULL in key/order/tie column — the bounded-heap reduce defines no NULL " +
            "ordering; filter or coalesce NULLs before calling topK")
      val key = r.getLong(kIdx)
      val ord = r.getDouble(oIdx)
      val tie = r.getLong(tIdx)
      var h = heaps.get(key)
      if (h == null) {
        h = scala.collection.mutable.PriorityQueue.empty[Entry](worstFirst)
        heaps.put(key, h)
      }
      if (h.size < k) {
        h.enqueue((ord, tie, r.copy()))
      } else {
        // primitive compare BEFORE any allocation (round 13: the old code
        // built a boxed (Double, Long, null) tuple per input row just to
        // ask the heap; on the map-side phase that is one allocation per
        // fact row, nearly all rejected). Same ordering as worstFirst,
        // including its Double.compare NaN totality.
        val head = h.head
        val c = java.lang.Double.compare(head._1, ord)
        if (c < 0 || (c == 0 && tie < head._2)) { // candidate beats the worst
          h.dequeue()
          h.enqueue((ord, tie, r.copy()))
        }
      }
    }
    val it = heaps.values().iterator()
    new Iterator[InternalRow] {
      private var cur: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!cur.hasNext && it.hasNext) {
          val h = it.next()
          val buf = new Array[InternalRow](h.size)
          var i = h.size - 1
          while (i >= 0) { buf(i) = h.dequeue()._3; i -= 1 } // best-first
          cur = buf.iterator
        }
        cur.hasNext
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        cur.next()
      }
    }
  }

  def idx(output: Seq[Attribute], a: Attribute, what: String): Int = {
    val i = output.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"top-k $what attribute must come from the child plan")
    i
  }
}

/** Map-side phase: no distribution requirement — reduces each input
  * partition in place, so only ≤ k rows per (task, local key) reach the
  * exchange the final phase asks for. */
case class PartialTopKExec(
    child: SparkPlan, key: Attribute, ord: Attribute, tie: Attribute, k: Int)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  protected override def doExecute(): RDD[InternalRow] = {
    val (ki, oi, ti) = (TopKHeaps.idx(output, key, "key"),
      TopKHeaps.idx(output, ord, "order"), TopKHeaps.idx(output, tie, "tie"))
    val n = k
    child.execute().mapPartitions(TopKHeaps.reduce(_, ki, oi, ti, n), preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering by key (EnsureRequirements
  * inserts the hash exchange over the partial survivors), merges the
  * per-task candidates, emits each key's rows best-first. */
case class FinalTopKExec(
    child: SparkPlan, key: Attribute, ord: Attribute, tie: Attribute, k: Int)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  protected override def doExecute(): RDD[InternalRow] = {
    val (ki, oi, ti) = (TopKHeaps.idx(output, key, "key"),
      TopKHeaps.idx(output, ord, "order"), TopKHeaps.idx(output, tie, "tie"))
    val n = k
    child.execute().mapPartitions(TopKHeaps.reduce(_, ki, oi, ti, n), preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Column-API entry point, same pattern as AsofJoin/IntervalJoin. */
object TopKPerKey {
  def topK(df: DataFrame, key: String, ord: String, tie: String, k: Int): DataFrame = {
    val lp = PlanBridge.logicalPlan(df)
    def attr(name: String): Attribute = EntryChecks.attr(lp, name)
    // TopKHeaps.reduce reads raw getLong/getDouble slots — the long/double
    // contract lived only in the doc comment, so an IntegerType key or a
    // non-double order column silently yielded garbage rows instead of an
    // error (ADVICE r5). Enforce types here, fail fast with the exact
    // mismatch. Nullability can't be a static check (parquet schemas are
    // nullable even for null-free data): actual NULLs are rejected at
    // runtime inside TopKHeaps.reduce.
    def require2(a: Attribute, role: String, dt: org.apache.spark.sql.types.DataType): Unit = {
      if (a.dataType != dt) throw new IllegalArgumentException(
        s"topK $role column '${a.name}' must be $dt (raw-slot heap reduce), got ${a.dataType}; " +
          "cast it explicitly before calling topK")
    }
    val (ka, oa, ta) = (attr(key), attr(ord), attr(tie))
    require2(ka, "key", org.apache.spark.sql.types.LongType)
    require2(oa, "order", org.apache.spark.sql.types.DoubleType)
    require2(ta, "tie", org.apache.spark.sql.types.LongType)
    require(k > 0, s"topK k must be positive, got $k")
    PlanBridge.dataFrame(df.sparkSession,
      TopKPerKeyNode(lp, ka, oa, ta, k))
  }
}
