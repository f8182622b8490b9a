package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` — the USER-facing custom-agg
  * API (vs the engine-internal `TypedImperativeAggregate` used by the
  * KMV/SpaceSaving/Count-Min sketches): case-class/tuple buffer, Encoder
  * serialization, registered with `functions.udaf`. Computed in the log
  * domain — the product of 10⁹ prices overflows a double immediately,
  * Σln(x)/n never does — and the (Σln, n) buffer merges associatively,
  * so partial aggregation composes map-side like any built-in.
  *
  * Non-positive inputs are EXCLUDED (round-13 negatives sweep): their
  * logarithm is undefined, and math.log would silently poison the whole
  * group's sum with NaN/−∞. The `a > 0` guard also skips NaN inputs
  * (every Scala NaN comparison is false) — and the oracle must spell
  * that out as `x > 0 AND NOT isnan(x)`, because DuckDB's comparison
  * semantics order NaN ABOVE every number, so a bare `x > 0` would
  * include NaN there and silently diverge (ADVICE r13). SQL aggregates
  * ignore the CASE's NULLs, matching the skip. A group with NO positive
  * values finishes NaN; the declared query maps that to NULL. */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a > 0) (b._1 + math.log(a), b._2 + 1L) else b
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
