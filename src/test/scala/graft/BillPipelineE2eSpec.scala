package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `bill_pipeline_e2e` (round 16, VERDICT r15 task 2): the reference's
  * composed dataflow — CSV ingest (with duplicate re-delivery) →
  * normalize → exact dedup → month-partitioned idempotent landing →
  * read-back census. The DuckDB oracle checks the census against the
  * source; this suite pins the two properties the oracle equality rides
  * on: the census survives a FULL double-run (re-running the whole
  * pipeline over its own scratch reproduces identical rows — overwrite
  * semantics at every seam), and the dedup stage actually removed the
  * manufactured re-deliveries (row counts match the source, not the
  * inflated drop).
  */
class BillPipelineE2eSpec extends AnyFunSuite {
  import TestSpark._

  private def run() = operators.Billing.billPipelineE2e(spark, sf0001)
    .collect().map(_.toSeq).toSeq

  test("census equals the direct source census (all four seams lossless)") {
    val got = run()
    val want = Tables.lineitem(spark, sf0001)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("l_orderkey").as("okey"),
        round(col("l_quantity"), 2).as("qty"),
        round(round(col("l_quantity"), 2) * round(col("l_extendedprice"), 2), 2).as("gross"))
      .groupBy("month")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("okey")).as("orders"),
        round(sum("qty"), 2).as("sum_qty"),
        round(sum("gross"), 2).as("gross"))
      .orderBy(col("month").asc)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
    // the 10% re-delivery really was dropped: total rows = source rows
    val totalRows = got.map(_(1).asInstanceOf[Long]).sum
    assert(totalRows === Tables.lineitem(spark, sf0001).count())
  }

  test("run-twice idempotency: a second full pipeline run reproduces identical rows") {
    val first = run()
    val second = run()
    assert(second === first)
  }
}
