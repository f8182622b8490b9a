package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins ScaleIdioms.twoLevelRank — the partitioned two-level prefix-sum
  * that replaces `row_number()/sum() OVER (ORDER BY …)` without the
  * single-task global sort — against the single-window form it
  * substitutes, on a frame built to hit the seams: heavy ties on the
  * order key (within bins and ON bin boundaries), empty bins in the
  * middle of the domain, both bin directions, and both the broadcast
  * and merge offset-join paths. agg_pareto's oracle certifies one
  * instance end-to-end; this spec certifies the idiom itself, so the
  * next consumer (rfm_segments/cust_migration's documented swap) can
  * trust it without re-deriving the boundary arithmetic. */
class TwoLevelRankSpec extends AnyFunSuite {
  import TestSpark._

  // deterministic, tie-heavy, gap-heavy: v in 0..96 via the Knuth hash,
  // then every bin whose index is ≡ 2 (mod 5) removed entirely — offsets
  // must carry across absent bins; w is an exact-integer cum column
  private def fixture = {
    val session = spark
    import session.implicits._
    (1 to 500)
      .map(id => (id.toLong, (id * 2654435761L % 97L + 97L) % 97L, (id % 13 + 1).toLong))
      .filter { case (_, v, _) => (v / 10) % 5 != 2 }
      .toDF("id", "v", "w")
  }

  private def mismatches(binAsc: Boolean, hint: String): Long = {
    val df = fixture
    val ord = if (binAsc) Seq(col("v").asc, col("id").asc)
              else Seq(col("v").desc, col("id").desc)
    val got = operators.ScaleIdioms.twoLevelRank(
      df, col("v") / 10, binAsc, ord, Some(col("w")), hint)
    val wAll = Window.orderBy(ord: _*)
    val exp = df
      .withColumn("rn_exp", row_number().over(wAll).cast("long"))
      .withColumn("cum_exp", sum("w").over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    got.join(exp.select("id", "rn_exp", "cum_exp"), "id")
      .filter(col("rn") =!= col("rn_exp") || col("cum") =!= col("cum_exp"))
      .count()
  }

  test("two-level rank+cumsum equals the global window, ascending, broadcast offsets") {
    assert(mismatches(binAsc = true, hint = "broadcast") == 0L)
  }

  test("two-level rank+cumsum equals the global window, descending, merge offsets") {
    assert(mismatches(binAsc = false, hint = "merge") == 0L)
  }

  test("reserved output columns are rejected, not silently replaced") {
    val session = spark
    import session.implicits._
    val bad = Seq((1L, 2L)).toDF("id", "rn")
    val e = intercept[IllegalArgumentException] {
      operators.ScaleIdioms.twoLevelRank(bad, col("id"), binAsc = true, Seq(col("id").asc))
    }
    assert(e.getMessage.contains("rn"))
  }
}
