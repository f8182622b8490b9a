package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleIdioms

/** The two distributed-execution idioms must equal their naive
  * single-partition formulations exactly — that equivalence is the whole
  * contract (the idioms exist so the naive shapes never run at scale). */
class ScaleIdiomsSpec extends AnyFunSuite {
  import TestSpark._

  test("ids_global: dense 0..n-1, identical to the single-partition row_number") {
    val got = ScaleIdioms.idsGlobal(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val n = got.length
    assert(got.map(_._2).toSet == (0L until n).toSet, "ids not dense 0..n-1")
    // global order: gid must be the rank of doc_id
    val byDoc = got.sortBy(_._1).map(_._2)
    assert(byDoc.sameElements(0L until n), "gid order != doc_id order")
  }

  test("ids_global: ids unchanged when the source arrives differently partitioned") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("lang"))
    val a = ScaleIdioms.idsGlobalFrom(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // same data through GENUINELY different initial layouts (round-5
    // advice: the old test ran the identical call twice, which could only
    // detect same-plan re-run instability): a skewed hash layout, a
    // single-partition funnel, and a reverse-range layout all must yield
    // the same ids, because the operator re-range-partitions on doc_id
    // before assigning anything.
    val layouts = Seq(
      docs.repartition(7, col("lang")),             // skewed low-cardinality hash
      docs.coalesce(1),                             // everything in one split
      docs.repartitionByRange(5, col("doc_id").desc)) // reversed ranges
    for (l <- layouts) {
      val b = ScaleIdioms.idsGlobalFrom(spark, l).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(b == a, "ids depended on the input layout")
    }
  }

  test("sec_sort_path: equals the collect_list/array_sort formulation") {
    val got = ScaleIdioms.secSortPath(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("tsus"),
        col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        array_join(transform(
          array_sort(collect_list(struct(col("tsus"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .orderBy(col("user_id").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.sameElements(want))
  }
}
