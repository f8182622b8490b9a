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

  test("materializeCounted: empty frame counts 0 via the count fallback, not a silent footer miss") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    val (scan, n) = operators.MemoFrames.materializeCounted(spark, "guard_empty", empty)
    assert(n == 0L && scan.count() == 0L)
    val some = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val (_, n2) = operators.MemoFrames.materializeCounted(spark, "guard_some", some)
    assert(n2 == 2L)
  }

  test("materialize supersedes same-tag files so repeated calls cannot grow tmpfs") {
    import spark.implicits._
    val d1 = operators.MemoFrames.materialize(spark, "guard_supersede",
      Seq(1L, 2L).toDF("v"))
    val p1 = d1.inputFiles.head.stripPrefix("file:")
    assert(new java.io.File(p1).exists())
    val d2 = operators.MemoFrames.materialize(spark, "guard_supersede",
      Seq(3L).toDF("v"))
    assert(d2.count() == 1L)
    // the first call's file is gone; the second call's is live
    assert(!new java.io.File(p1).exists(),
      "superseded mat_* file should be deleted (ADVICE r10 tmpfs growth)")
  }

  test("EventPattern accepts an arbitrary hand-built automaton, not just stage chains") {
    import graft.operators.EventPattern
    import graft.operators.EventPattern.NfaSpec
    // 'a (not-b)* c' — accept an a...c span containing no b: a real
    // pattern stages() cannot express (negation), wired directly as delta
    val nfa = NfaSpec(accept = 2, delta = Map(
      (0, "a") -> 1,
      (1, "a") -> 1, (1, "x") -> 1, (1, "c") -> 2))
      // (1, "b") missing → restart; b cannot re-enter except via a
    def cnt(s: String) =
      EventPattern.matchCount(s.split(" ").iterator.filter(_.nonEmpty), nfa)
    assert(cnt("a x c") == 1)
    assert(cnt("a b c") == 0)         // b kills the attempt
    assert(cnt("a x c a c") == 2)
    assert(cnt("a b a c") == 1)       // restart after the b, new a opens
    assert(cnt("c x a") == 0)
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
