package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain_long(key)` over a pre-built Bloom filter — the probe
  * side of an EXPLICIT runtime-filter join (operators.RuntimeFilter's
  * `join_bloom_pruned`). The filter is built once on the (filtered,
  * small) dim-key set and shipped to every task inside the expression;
  * the fact side then drops non-joining rows IN THE SCAN STAGE, before
  * any shuffle. Catalyst's own InjectRuntimeFilter does this same
  * rewrite automatically for big shuffle joins; the explicit form makes
  * the pattern a declared, testable operator with a deterministic
  * filter (spark-sketch Bloom filters hash with fixed seeds and merge
  * by bit-OR, so the bit set is independent of row order and
  * partitioning).
  *
  * Codegen: the filter rides the generated code as a reference object —
  * one virtual call per row, no boxing; falls back to the same call in
  * interpreted eval. Never null-propagating beyond its child (a NULL
  * key is simply not contained).
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_long"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // BloomFilterImpl is java-serializable, so it can ride the references
    // array of the generated class directly
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry point (same ColumnBridge pattern as `sim`). */
object bloom {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
  def mightContainLong(key: Column, bf: BloomFilter): Column =
    column(BloomMightContainLong(expression(key), bf))
}
