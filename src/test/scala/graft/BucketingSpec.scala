package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketing = the co-located-join story at 100 TB (SURVEY §4.4): write
  * both fact tables bucketed by the join key once, and every subsequent
  * join on that key runs with ZERO shuffle — the planner trusts the
  * on-disk hash partitioning. This spec proves the engine produces that
  * plan, not just that the join returns correct rows. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE to finalize the plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum
  }

  test("bucketed tables join without any shuffle exchange") {
    Tables.orders(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sf0001)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("lines"), round(sum("l_quantity"), 2).as("qty"))
      // correctness: same as joining the raw parquet
      val expect = Tables.orders(spark, sf0001)
        .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("lines"), round(sum("l_quantity"), 2).as("qty"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ===
        expect.orderBy("o_orderkey").collect().toSeq)
      // the point: the bucketed join itself needs no shuffle at all
      val bare = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_linenumber")
      assert(countShuffles(bare) === 0, "bucketed equi-join must be shuffle-free")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("declared join_bucketed query joins without a shuffle below the join") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // at sf0.001 AQE would broadcast the tiny side — disable so the plan
    // shows the co-located sort-merge shape a 100 TB join would use
    val session = spark.newSession()
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE off too: materialized QueryStageExec wrappers hide their
    // subtrees from plan.collect, so assert on the static plan
    session.conf.set("spark.sql.adaptive.enabled", "false")
    val df = operators.SourcesSinks.joinBucketed(session, sf0001)
    val plan = df.queryExecution.executedPlan
    val joins = plan.collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, "bucketed join should plan as sort-merge")
    val shufflesBelowJoin = joins.map(_.collect { case _: ShuffleExchangeExec => 1 }.sum).sum
    assert(shufflesBelowJoin === 0,
      "bucketed sides must feed the join with no exchange")
  }
}
