package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 guards (VERDICT r10 task 7): agg_spearman's decimal moment
  * arithmetic driven through an OVERSIZED group — n = 3M rows in one
  * segment, where n³ ≈ 2.7e19 and Σrx² ≈ 3.6e19 both exceed
  * Long.MaxValue (9.22e18), so the five DECIMAL(38,0) moment sums are
  * doing real work, not decoration. sf10-class group sizes can therefore
  * not silently wrap: the sums carry ~1e19 magnitudes exactly, and the
  * formula still returns a bounded ρ. Exact endpoint cases pin the
  * formula itself. */
class Round11GuardSpec extends AnyFunSuite {
  import TestSpark._

  private def frame(n: Long, y: org.apache.spark.sql.Column) =
    spark.range(n).select(lit("g").as("segment"), col("id").as("x"), y.as("y"))

  test("spearman endpoint: identical order gives rho exactly 1, reversed exactly -1") {
    val up = operators.Aggregates.spearmanBySegment(frame(1000, col("id"))).head()
    assert(up.getLong(1) == 1000L && up.getDouble(2) == 1.0)
    val down = operators.Aggregates.spearmanBySegment(frame(1000, -col("id"))).head()
    assert(down.getDouble(2) == -1.0)
  }

  test("spearman survives a group whose cubed size exceeds int64") {
    val n = 3000000L
    assert(BigInt(n).pow(3) > BigInt(Long.MaxValue)) // the point of the test
    // deterministic scramble (Knuth multiplicative hash mod n): near-zero
    // rank correlation, many distinct values, no RNG
    val r = operators.Aggregates.spearmanBySegment(
      frame(n, (col("id") * 2654435761L) % n)).head()
    assert(r.getLong(1) == n)
    val rho = r.getDouble(2)
    assert(!rho.isNaN && math.abs(rho) <= 1.0, s"rho out of range: $rho")
    assert(math.abs(rho) < 0.1, s"scrambled ranks should decorrelate, got $rho")
  }
}
