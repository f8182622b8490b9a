package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DSv2 connector: pushdown/pruning reach the scan, values match the
  * generation rule, partition split covers the range exactly once. */
class SyntheticDocsSpec extends AnyFunSuite {
  import TestSpark._

  private def docs =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", "10000").option("partitions", "4").load()

  test("doc_id range filter is pushed into the generated range") {
    val df = docs.filter(col("doc_id") >= 100 && col("doc_id") < 250)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("range=[100, 250)"),
      s"pushed range must reach the scan description:\n${scan.take(1500)}")
    assert(df.count() === 150)
  }

  test("column pruning reaches the scan") {
    val df = docs.select("lang")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=lang"), s"pruned schema must reach the scan:\n${scan.take(1500)}")
    assert(df.distinct().count() === 5)
  }

  test("values follow the generation rule; the range is covered exactly once") {
    val rows = docs.filter(col("doc_id") < 100).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 100L))
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === graft.sources.SyntheticDocs.lang(id))
      assert(r.getString(2) === graft.sources.SyntheticDocs.source(id))
      assert(r.getLong(3) === graft.sources.SyntheticDocs.nChars(id))
    }
  }

  test("equality pushdown narrows to a single row") {
    val df = docs.filter(col("doc_id") === 4242)
    assert(df.queryExecution.executedPlan.toString.contains("range=[4242, 4243)"))
    assert(df.count() === 1)
  }
}
