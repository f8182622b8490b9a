package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.plans.{FinalTopKExec, PartialTopKExec, TopKPerKey}

/** Contract of the native per-key top-k operator: (1) results identical
  * to the window row_number formulation, under any input partitioning;
  * (2) the plan really has the map-side partial phase BELOW the exchange
  * (the whole point — only per-task survivors shuffle); (3) ties on the
  * order value break by the tie key, deterministically. */
class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark._

  private def windowed(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("native top-k = window top-k, for k = 1 and 3, any partitioning") {
    for (k <- Seq(1, 3); parts <- Seq(1, 7)) {
      val in = Tables.orders(spark, sf0001)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .repartition(parts)
      val native = collectSet(TopKPerKey.topK(in, "o_custkey", "o_totalprice", "o_orderkey", k))
      assert(native == collectSet(windowed(k)), s"k=$k parts=$parts")
    }
  }

  test("partial phase sits below the shuffle, final above it") {
    // static plan (AQE off) — the adaptive form wraps each stage in
    // QueryStage leaves that hide the operators from collect()
    val session = spark.newSession()
    session.conf.set("spark.sql.adaptive.enabled", "false")
    val df = TopKPerKey.topK(
      Tables.orders(session, sf0001).select("o_custkey", "o_orderkey", "o_totalprice"),
      "o_custkey", "o_totalprice", "o_orderkey", 3)
    val plan = df.queryExecution.executedPlan
    val finals = plan.collect { case f: FinalTopKExec => f }
    assert(finals.size == 1, s"expected one FinalTopKExec in:\n$plan")
    val exchanges = finals.head.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 1, s"no exchange between partial and final in:\n$plan")
    val partialBelowShuffle = exchanges.head.collect { case p: PartialTopKExec => p }
    assert(partialBelowShuffle.size == 1,
      s"PartialTopKExec not found below the shuffle in:\n$plan")
  }

  test("ties on the order value break by the tie key ascending") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 7L, 5.0), (1L, 9L, 5.0), (1L, 8L, 1.0),
      (2L, 3L, 2.0), (2L, 4L, 2.0)
    ).toDF("k", "id", "v")
    val got = TopKPerKey.topK(df, "k", "v", "id", 2)
      .orderBy(col("k").asc, col("v").desc, col("id").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 7L), (1L, 9L), (2L, 3L), (2L, 4L)))
  }
}
