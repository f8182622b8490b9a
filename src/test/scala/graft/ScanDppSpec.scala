package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
import graft.operators.SourcesSinks

/** scan_dpp's whole point is that the fact scan is pruned by a RUNTIME
  * subquery over the filtered dim — if Catalyst ever stops injecting the
  * dynamicpruning filter (config drift, a join-shape edit, a heuristic
  * change), the query silently degrades to a full fact scan while staying
  * correct. This spec fails on that regression. */
class ScanDppSpec extends AnyFunSuite {
  import TestSpark._

  test("fact scan carries a dynamicpruning partition filter") {
    // static plan (AQE off): the classic DPP path materializes the
    // DynamicPruningExpression in the scan's partitionFilters, where the
    // AQE form hides the scan inside adaptive stages
    val session = spark.newSession()
    session.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SourcesSinks.scanDpp(session, sf0001)
    val scans = df.queryExecution.executedPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s
    }
    val pruned = scans.filter(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[DynamicPruningExpression])))
    assert(pruned.nonEmpty,
      s"no scan has a DynamicPruningExpression partition filter; scans: " +
        scans.map(_.partitionFilters.mkString(",")).mkString(" | "))
    // and the result itself must be the pruned quarters only
    val months = df.collect().map(_.getString(0))
    assert(months.nonEmpty)
    assert(months.forall(m => Set("01", "02", "03").contains(m.substring(5))))
  }
}
