package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** hist_eqdepth's rank-selection cutpoint pass (one value→count pre-agg +
  * cumulative ranks) must agree EXACTLY — tie for tie, boundary for
  * boundary — with the nine-percentile_disc formulation it replaced,
  * because that formulation is verbatim the DuckDB oracle text. Two
  * layers: full-output equality on real data at two SFs, and cutpoint
  * equality against Spark's own percentile_disc on tie-heavy fixtures
  * engineered to land cumulative ranks exactly on the decile boundaries
  * (where a ceil-vs-cume_dist semantic difference would show up). */
class EqdepthSemanticsSpec extends AnyFunSuite {
  import TestSpark._

  test("rank-selection output equals the percentile_disc formulation (sf0.001 + sf0.01)") {
    Seq(sf0001, sf001).foreach { dir =>
      val fast = Analytics.histEqdepth(spark, dir).collect()
      val ref  = Analytics.histEqdepthDisc(spark, dir).collect()
      assert(fast.length === ref.length, s"row count @ $dir")
      fast.zip(ref).foreach { case (f, r) =>
        assert(f.toSeq === r.toSeq, s"row mismatch @ $dir")
      }
    }
  }

  /** min(v | cume_dist(v) >= p) must equal percentile_disc(p) on fixtures
    * where cumulative counts hit p*N exactly (ties straddling boundaries,
    * N a multiple of 10) and where they don't (prime N). */
  test("cume_dist cutpoint selection matches percentile_disc on boundary-tied fixtures") {
    import spark.implicits._
    val fixtures: Seq[Seq[Double]] = Seq(
      // N=10, distinct: boundary p=0.1 lands exactly on rank 1
      (1 to 10).map(_.toDouble),
      // N=20, value k repeated twice: every decile boundary is a tie edge
      (1 to 10).flatMap(k => Seq(k.toDouble, k.toDouble)),
      // N=30, skewed ties: 21 copies of 1.0 then 2..10 — p<=0.7 all hit 1.0
      Seq.fill(21)(1.0) ++ (2 to 10).map(_.toDouble),
      // N=7 (prime): no boundary lands exactly; floor/ceil choices differ
      Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0),
      // N=40 with a 4-way tie crossing the median boundary
      (1 to 18).map(_.toDouble) ++ Seq.fill(4)(18.5) ++ (19 to 36).map(_.toDouble))
    fixtures.zipWithIndex.foreach { case (vals, i) =>
      val df = vals.toDF("v")
      df.createOrReplaceTempView("probe_vals")
      val expected = spark.sql(
        (1 to 9).map(k =>
          s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY v) AS c$k").mkString(
          "SELECT ", ", ", " FROM probe_vals")).collect()(0)
      val cum = df.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(
          org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
      val got = cum.agg(
        min(when(col("cum") / col("n_total") >= 0.1, col("v"))).as("c1"),
        (2 to 9).map(k =>
          min(when(col("cum") / col("n_total") >= k / 10.0, col("v"))).as(s"c$k")): _*)
        .collect()(0)
      (0 until 9).foreach { j =>
        assert(got.getDouble(j) === expected.getDouble(j),
          s"fixture $i decile ${j + 1}: rank-selection ${got.getDouble(j)} vs percentile_disc ${expected.getDouble(j)}")
      }
    }
  }
}
