package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees (functions/CountMinSketch.scala): the
  * estimate never undercounts, overcounts by at most εN (ε = e/w, here
  * e/512 ≈ 0.0053) with overwhelming probability at d=4, and — the
  * property that makes it a 100 TB aggregate — the merged result is
  * independent of input partitioning. */
class CountMinSpec extends AnyFunSuite {
  import TestSpark._

  private val probes = Seq("the", "data", "key")

  private def exactCounts = Tables.documents(spark, sf001)
    .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    .filter(col("tok").isin(probes: _*))
    .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
    .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def totals = Tables.documents(spark, sf001)
    .select(col("lang"), size(split(col("text"), " ")).cast("bigint").as("n"))
    .groupBy("lang").agg(sum("n").as("n"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("never undercounts, overcounts by at most ~εN") {
    val est = operators.Aggregates.aggCountmin(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = exactCounts
    val n = totals
    est.foreach { case ((lang, tok), e) =>
      val t = exact.getOrElse((lang, tok), 0L)
      assert(e >= t, s"CM undercounted $lang/$tok: $e < $t")
      // bound with 3x slack over eN = (e/512)·N — d=4 makes exceeding
      // even 1x vanishingly unlikely, but the spec should not flake
      val bound = t + math.max(1L, (3 * 2.718 * n(lang) / 512).toLong)
      assert(e <= bound, s"CM overcounted $lang/$tok: $e > $bound (exact $t)")
    }
    assert(est.size === 5 * probes.size)
  }

  test("estimates are invariant under input partitioning") {
    def run(parts: Int) = Tables.documents(spark, sf001)
      .repartition(parts)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang")
      .agg(graft.functions.sim.countMinFreq(col("tok"), probes).as("est"))
      .select(col("lang"), col("est"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(3) === run(17))
  }
}
