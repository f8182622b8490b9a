package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.JoinsAdvanced

/** Native interval join (custom LogicalPlan/Strategy/SparkPlan) must agree
  * exactly with the bucketed-rewrite formulation, and must plan through
  * IntervalJoinExec (not fall back to some other join). */
class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("native interval join returns exactly the bucketed formulation's rows") {
    val native = JoinsAdvanced.joinIntervalNative(spark, sf0001).collect()
    val bucketed = JoinsAdvanced.joinInterval(spark, sf0001).collect()
    assert(native.length === bucketed.length)
    native.zip(bucketed).foreach { case (n, b) =>
      assert(n.toSeq === b.toSeq)
    }
  }

  test("the physical plan contains IntervalJoinExec") {
    val df = JoinsAdvanced.joinIntervalNative(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), s"expected IntervalJoinExec in plan:\n$plan")
  }

  test("window bounds are [ts, ts+W) and keys partition matches, on a crafted fixture") {
    import spark.implicits._
    def ts(df: org.apache.spark.sql.DataFrame, c: String) =
      df.withColumn(c, timestamp_micros(col(c)))
    val a = ts(Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 100L))
      .toDF("a_id", "a_user", "a_ts"), "a_ts")
    val b = ts(Seq(
      (10L, 100L), // == a1.ts: inclusive lower bound
      (10L, 199L), // inside a1's window
      (10L, 200L), // == a1.ts+W: exclusive upper bound -> a1 no, a2 no (before 250)
      (10L, 260L), // inside a2's window only
      (20L, 99L),  // below a3's window
      (30L, 100L)) // key with no left side
      .toDF("b_user", "b_ts"), "b_ts")
    val out = graft.plans.IntervalJoin
      .interval(a, b, "a_user", "a_ts", "b_user", "b_ts", 100L)
      .select(col("a_id"), unix_micros(col("b_ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // a1 (user 10, [100,200)): b at 100, 199. a2 (user 10, [250,350)): b at 260.
    // a3 (user 20, [100,200)): nothing (99 is below). Key 30: unmatched.
    assert(out === Seq((1L, 100L), (1L, 199L), (2L, 260L)))
  }

  test("a right row spanning several left windows is emitted for each (buffer reuse)") {
    import spark.implicits._
    val a = Seq((1L, 5L, 100L), (2L, 5L, 110L), (3L, 5L, 120L))
      .toDF("a_id", "a_user", "a_ts")
      .withColumn("a_ts", timestamp_micros(col("a_ts")))
    val b = Seq((5L, 150L)).toDF("b_user", "b_ts")
      .withColumn("b_ts", timestamp_micros(col("b_ts")))
    val out = graft.plans.IntervalJoin
      .interval(a, b, "a_user", "a_ts", "b_user", "b_ts", 100L)
      .select("a_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 2L, 3L))
  }
}
