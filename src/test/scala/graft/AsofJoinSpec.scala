package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.JoinsAdvanced

/** Native as-of join (custom LogicalPlan/Strategy/SparkPlan) must agree
  * exactly with the group-by-arg-max formulation, and must plan through
  * AsofJoinExec (not fall back to some other join). */
class AsofJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("native as-of join returns exactly the arg-max formulation's rows") {
    val native = JoinsAdvanced.joinAsofNative(spark, sf0001).collect()
    val argmax = JoinsAdvanced.joinAsof(spark, sf0001).collect()
    assert(native.length === argmax.length)
    native.zip(argmax).foreach { case (n, a) =>
      assert(n.toSeq === a.toSeq)
    }
  }

  test("the physical plan contains AsofJoinExec") {
    val df = JoinsAdvanced.joinAsofNative(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in plan:\n$plan")
  }

  test("as-of picks the latest (ts, tie) match per left row on a crafted fixture") {
    import spark.implicits._
    val ev = Seq((1L, 100L, 10L), (2L, 200L, 10L), (3L, 50L, 20L))
      .toDF("event_id", "ts", "user_id")
      .select(col("event_id"), timestamp_micros(col("ts")).as("ts"), col("user_id"))
    val od = Seq(
      (10L, 101L, 90L), (10L, 102L, 100L), (10L, 103L, 100L), // ts tie -> key 103
      (10L, 104L, 150L),                                      // only for event 2
      (20L, 201L, 60L))                                       // after event 3: no match
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
      .select(col("o_custkey"), col("o_orderkey"),
        timestamp_micros(col("o_orderdate")).as("o_orderdate"))
    val out = graft.plans.AsofJoin
      .asof(ev, od, "user_id", "ts", "o_custkey", "o_orderdate", "o_orderkey")
      .select("event_id", "o_orderkey")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // event 1: orders at 90/100/100 -> latest ts=100, tie -> max key 103
    // event 2: order at 150 -> key 104; event 3 (user 20): no order <= 50 -> dropped
    assert(out.toSeq === Seq((1L, 103L), (2L, 104L)))
  }
}
