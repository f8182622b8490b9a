package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, DdSketchState, JaccardLongSim, JaccardSim, KmvDistinct, KmvState, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions (`jaccard_sim`, `cosine_sim`) so they are
  * usable from `spark.sql(...)` as well as the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — Verify,
  * Bench, and the test harness all do.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (children: Seq[Expression]) => JaccardSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
      (children: Seq[Expression]) => KmvDistinct(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("kmv_state"),
      new ExpressionInfo(classOf[KmvState].getName, "kmv_state"),
      (children: Seq[Expression]) => KmvState(children.head).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("ddsketch_state"),
      new ExpressionInfo(classOf[DdSketchState].getName, "ddsketch_state"),
      // ddsketch_state(col [, alpha [, maxBuckets]]): extra args must be
      // foldable literals and are HONORED — silently dropping them would
      // hand a caller who asked for alpha=0.05 a 1% sketch whose states
      // merge incompatibly with genuine 5% states (round-13 review)
      (children: Seq[Expression]) => {
        def lit[T](e: Expression, what: String, f: Any => T): T = e match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal => f(l.value)
          case _ => throw new IllegalArgumentException(
            s"ddsketch_state: $what must be a literal, got $e")
        }
        val alpha = if (children.size >= 2)
          lit(children(1), "alpha", {
            case d: java.lang.Number => d.doubleValue()
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case v => throw new IllegalArgumentException(s"alpha: $v")
          }) else 0.01
        val maxB = if (children.size >= 3)
          lit(children(2), "maxBuckets", {
            case n: java.lang.Number => n.intValue()
            case v => throw new IllegalArgumentException(s"maxBuckets: $v")
          }) else 2048
        require(children.nonEmpty && children.size <= 3,
          s"ddsketch_state takes 1-3 args, got ${children.size}")
        DdSketchState(children.head, alpha, maxB).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_long_sim"),
      new ExpressionInfo(classOf[JaccardLongSim].getName, "jaccard_long_sim"),
      (children: Seq[Expression]) => JaccardLongSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    // whole-operator extensions: native as-of join (graft.plans.AsofJoin)
    // and native interval join (graft.plans.IntervalJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    // native per-key top-k with a map-side partial phase (graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // optimizer rule: naive SQL jaccard_sim over sorted-distinct inputs →
    // the zero-allocation merge kernel (graft.plans.SortedJaccardRewrite)
    ext.injectOptimizerRule(_ => graft.plans.SortedJaccardRewrite)
  }
}
