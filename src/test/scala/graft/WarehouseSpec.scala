package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Warehouse ops: DQ audit invariants, SCD2 ≡ as-of equivalence,
  * anomaly/streak sanity. */
class WarehouseSpec extends AnyFunSuite {
  import TestSpark._

  test("dq_checks: key uniqueness and null counts are internally consistent") {
    val r = DataQuality.dqChecks(spark, sf0001).head()
    val rows = r.getLong(0)
    assert(r.getLong(1) <= rows)                       // nonnull <= rows
    assert(r.getLong(2) + r.getLong(3) === rows)       // distinct + dups = rows
    assert(r.getDouble(4) <= r.getDouble(5))           // min <= max
  }

  test("scd2 point-in-time join picks exactly the as-of order per event") {
    val scd2 = DataQuality.joinScd2(spark, sf0001)
      .select(col("event_id"), col("scd_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val asof = JoinsAdvanced.joinAsof(spark, sf0001)
      .select(col("event_id"), col("best_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scd2 === asof, "SCD2 validity-range join must equal the as-of arg-max")
  }

  test("ts_anomaly: z is null until a trailing window exists; flags match z") {
    val rows = TimeSeries.tsAnomaly(spark, sf0001).collect()
    assert(rows.head.isNullAt(2), "first day has no trailing window")
    rows.filter(r => !r.isNullAt(2)).foreach { r =>
      assert(r.getBoolean(3) === (math.abs(r.getDouble(2)) > 2))
    }
  }

  test("win_streak: longest >= avg >= 1 for every priority") {
    val rows = Windows.winStreak(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) >= math.ceil(r.getDouble(3)).toLong)
      assert(r.getDouble(3) >= 1.0)
    }
  }
}
