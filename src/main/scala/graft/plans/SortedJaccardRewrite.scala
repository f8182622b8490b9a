package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Literal, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.JaccardSim

/** Injected optimizer rule (`ext.injectOptimizerRule`): a SQL user who
  * writes the natural
  * `jaccard_sim(sort_array(array_distinct(a)), sort_array(array_distinct(b)))`
  * gets the general hash-set kernel, because SQL function registration
  * can't see the arguments. This rule pattern-matches exactly that shape
  * and flips the expression to the zero-allocation merge-intersection
  * kernel (`assumeDistinct + assumeSorted`) — the same one the Column API
  * call sites pick by hand. Preconditions are guaranteed by the matched
  * children themselves: `array_distinct` ⇒ distinct, ascending
  * `sort_array` ⇒ sorted; values are identical (asserted in
  * Round2OpsSpec), only the kernel changes.
  */
object SortedJaccardRewrite extends Rule[LogicalPlan] {
  private def sortedDistinct(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e match {
      // containsNull guard (round 13): the merge kernel compares elements
      // with getUTF8String(i).compareTo — a NULL element (which ascending
      // sort_array places FIRST) would NPE at runtime, while the general
      // hash-set kernel tolerates it. array_distinct/sort_array preserve
      // the child's containsNull, so the static check is exact: arrays
      // that can hold NULL elements keep the null-safe kernel.
      case sa @ SortArray(ArrayDistinct(_), Literal(true, _)) =>
        sa.dataType match {
          case at: org.apache.spark.sql.types.ArrayType => !at.containsNull
          case _ => false
        }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case j @ JaccardSim(a, b, _, false) if sortedDistinct(a) && sortedDistinct(b) =>
      j.copy(assumeDistinct = true, assumeSorted = true)
  }
}
