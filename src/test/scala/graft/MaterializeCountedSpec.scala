package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins MemoFrames.materializeCounted — the zero-job convergence probe
  * the k-core peel reads from parquet footers — against the count() it
  * replaces: multi-partition writes (one footer per task file), an
  * empty frame (a converged-to-empty peel must read 0, not throw), and
  * the returned scan itself. */
class MaterializeCountedSpec extends AnyFunSuite {
  import TestSpark._

  test("footer row count equals count() across partitions, and the scan reads back") {
    val df = spark.range(0, 10007, 1, 8)
      .select(col("id"), (col("id") % 7).as("g"))
    val (scan, n) = operators.MemoFrames.materializeCounted(spark, "mcs_multi", df)
    assert(n == 10007L)
    assert(scan.count() == 10007L)
  }

  test("an empty frame counts zero") {
    val df = spark.range(100).toDF("id").filter(col("id") < 0)
    val (scan, n) = operators.MemoFrames.materializeCounted(spark, "mcs_empty", df)
    assert(n == 0L)
    assert(scan.count() == 0L)
  }
}
