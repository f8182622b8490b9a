package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Shared entry-point validation for the custom physical operators
  * (round 13 — the TopKPerKey ADVICE-r5 guard generalized; previously the
  * identical attr-lookup helper was copy-pasted into three entry points
  * and the type/NULL contract was enforced only by topK). */
private[plans] object EntryChecks {

  def attr(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))

  /** The merge passes read key/ts slots with raw getLong, which is only
    * meaningful for 8-byte long-backed types: integral longs and the two
    * timestamp types (micros-as-long in InternalRow). An IntegerType key
    * or DateType ts would read garbage SILENTLY (4-byte slot / days-as-
    * int), so fail fast with the exact mismatch — the TopKPerKey
    * precedent. Nullability is a runtime concern (parquet schemas are
    * nullable for null-free data): NULL key/ts rows are SKIPPED inside
    * the merge, matching the SQL-join oracle semantics. */
  def requireLongBacked(a: Attribute, op: String, role: String): Unit = {
    val ok: DataType => Boolean = {
      case LongType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (!ok(a.dataType)) throw new IllegalArgumentException(
      s"$op $role column '${a.name}' must be a long-backed type " +
        s"(BIGINT / TIMESTAMP / TIMESTAMP_NTZ — raw-slot merge), got ${a.dataType}; " +
        "cast it explicitly before calling")
  }

  /** A self-join of the SAME analyzed plan would duplicate every exprId
    * in the node's output — downstream resolution then either throws an
    * ambiguous-reference error or silently binds right-side columns to
    * the left occurrence. Spark's Join analyzer fixes this with
    * dedupRight; these nodes are built post-analysis, so fail fast with
    * the workaround instead of producing silently unreadable output. */
  def requireDisjointOutputs(op: String, lp: LogicalPlan, rp: LogicalPlan): Unit = {
    val shared = lp.outputSet.intersect(rp.outputSet)
    if (shared.nonEmpty) throw new IllegalArgumentException(
      s"$op: left and right sides share ${shared.size} attribute(s) " +
        s"(e.g. ${shared.head}) — a self-join needs fresh attributes on one side; " +
        "re-select with new aliases first, e.g. " +
        "df.select(df.columns.map(c => col(c).as(c + \"_r\")): _*)")
  }
}
