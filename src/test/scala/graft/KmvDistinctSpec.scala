package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.sim

/** The KMV sketch aggregate: exact below k, accurate above, and
  * merge-invariant (partitioning must not change the result — the
  * property that makes sketch partials safe to ship between jobs). */
class KmvDistinctSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("exact when distinct count < k") {
    val out = operators.Aggregates.aggKmvDistinct(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = operators.Aggregates.aggDistinct(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === exact, "150 users < k=256 ⇒ sketch must be exact")
  }

  test("within 15% when distinct count >> k") {
    val n = 20000
    val df = (0 until n).map(i => i % 5000).toDF("v") // 5000 distinct
    val est = df.agg(sim.kmvDistinct(col("v")).as("e")).head().getLong(0)
    assert(math.abs(est - 5000).toDouble / 5000 <= 0.15, s"estimate=$est")
  }

  test("merge-invariant: estimate identical under any partitioning") {
    val df = (0 until 30000).map(i => (i * 2654435761L) % 9000).toDF("v")
    val a = df.repartition(1).agg(sim.kmvDistinct(col("v"))).head().getLong(0)
    val b = df.repartition(13).agg(sim.kmvDistinct(col("v"))).head().getLong(0)
    val c = df.repartition(4, col("v")).agg(sim.kmvDistinct(col("v"))).head().getLong(0)
    assert(a === b)
    assert(b === c)
  }

  test("approx_percentile tracks exact percentiles within 2%") {
    val approx = operators.Aggregates.aggApproxPctl(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = operators.Aggregates.aggPercentiles(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 <= 0.02, s"$k p50")
      assert(math.abs(approx(k)._2 - p95) / p95 <= 0.02, s"$k p95")
    }
  }

  test("usable from SQL via extension registration") {
    Tables.registerAll(spark, sf0001)
    val est = spark.sql("SELECT kmv_distinct(user_id) FROM events").head().getLong(0)
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM events").head().getLong(0)
    assert(est === exact) // below k ⇒ exact
  }
}
