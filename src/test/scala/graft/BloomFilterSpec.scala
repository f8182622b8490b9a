package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The explicit runtime-filter join (join_bloom_pruned): the expression
  * has no false negatives, the pruned join equals the plain join (the
  * oracle's formulation), and the Bloom pass actually prunes — a filter
  * that passes everything would be a silent no-op. */
class BloomFilterSpec extends AnyFunSuite {
  import TestSpark._

  test("might_contain_long has no false negatives and some selectivity") {
    val bf = BloomFilter.create(1 << 10, 0.01)
    (0L until 100L).foreach(k => bf.putLong(k * 7))
    val probe = spark.range(0, 1000).select(col("id"),
      graft.functions.bloom.mightContainLong(col("id"), bf).as("hit"))
    val hits = probe.filter(col("hit")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert((0L until 100L).map(_ * 7).forall(hits.contains), "false negative")
    // 1% fpp on 900 non-members ⇒ ~9 expected false positives
    assert(hits.size < 200, s"filter passes ${hits.size}/1000 — not selective")
  }

  test("bloom-pruned join result equals the plain join") {
    val pruned = operators.RuntimeFilter.joinBloomPruned(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("orders"), round(sum("o_totalprice"), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === plain)
  }

  test("the bloom pass prunes the fact side before the join") {
    val cust = Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bf = cust.stat.bloomFilter("c_custkey", 1 << 17, 0.01)
    val orders = Tables.orders(spark, sf0001)
    val total = orders.count()
    val kept = orders.filter(
      graft.functions.bloom.mightContainLong(col("o_custkey").cast("long"), bf)).count()
    // BUILDING is one of 5 segments — the pruned side must be well under
    // half the fact table (fpp 1% adds almost nothing)
    assert(kept < total / 2, s"bloom kept $kept of $total fact rows")
    assert(kept > 0)
  }
}
