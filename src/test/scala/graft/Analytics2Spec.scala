package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 wave-6 semantics (Analytics2). The DuckDB oracle proves value
  * equality for all five queries; these tests pin the definitional
  * properties the hash compare cannot see — the cohort identity at age 0,
  * the skyline's dominance law replayed in Scala, the symmetry laws of
  * association rules, crossing-edge consistency, and the two attribution
  * models' conservation of the purchase set. */
class Analytics2Spec extends AnyFunSuite {
  import TestSpark._

  test("cohort_triangle: age-0 identity, monotone bounds, census") {
    val out = operators.Analytics2.cohortTriangle(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (age, active, users, ret) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(age >= 0 && active >= 1 && active <= users)
      if (age == 0) assert(active == users && ret == 1.0,
        "every cohort customer is active in the cohort month")
      assert(ret > 0 && ret <= 1.0)
    }
    // age-0 cohort sizes partition the customer base with ≥1 order
    val custs = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(out.filter(_.getInt(1) == 0).map(_.getLong(3)).sum == custs)
  }

  test("skyline_2d: exactly the non-dominated parts (dominance replayed)") {
    val parts = Tables.part(spark, sf0001)
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominated(a: (Long, Int, Double)) = parts.exists { b =>
      b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)
    }
    val expect = parts.filterNot(dominated).map(_._1).toSet
    val got = operators.Analytics2.skyline2d(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got == expect, s"frontier mismatch: got $got expect $expect")
  }

  test("basket_rules: support symmetry, lift symmetry, probability bounds") {
    val out = operators.Analytics2.basketRules(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    byPair.foreach { case ((a, b), (nab, conf, lift)) =>
      assert(conf > 0 && conf <= 1.0)
      assert(lift > 0)
      // n(ab) = n(ba); lift is symmetric (confidence is not)
      byPair.get((b, a)).foreach { case (nba, _, liftBa) =>
        assert(nba == nab)
        assert(math.abs(lift - liftBa) <= 1e-6 + 1e-9)
      }
    }
  }

  test("ts_sma_crossover: flags are exclusive edges of the above sequence") {
    val out = operators.Analytics2.tsSmaCrossover(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val seq = rows.sortBy(_.getDate(1).toString)
      seq.foreach { r =>
        val (above, golden, death) = (r.getInt(4), r.getInt(5), r.getInt(6))
        assert(golden + death <= 1)
        if (golden == 1) assert(above == 1)
        if (death == 1) assert(above == 0)
      }
      // within the emitted window, a crossing flag requires a flip from
      // the previous emitted row's above state
      seq.sliding(2).foreach {
        case Array(p, c) =>
          if (c.getInt(5) == 1) assert(p.getInt(4) == 0, "golden needs below→above")
          if (c.getInt(6) == 1) assert(p.getInt(4) == 1, "death needs above→below")
          if (c.getInt(5) == 0 && c.getInt(6) == 0)
            assert(c.getInt(4) == p.getInt(4), "no flag ⇒ no flip")
        case _ =>
      }
    }
  }

  test("attr_touch: both models attribute the identical purchase set") {
    val out = operators.Analytics2.attrTouch(spark, sf0001).collect()
    val first = out.filter(_.getString(0) == "first")
    val last = out.filter(_.getString(0) == "last")
    assert(first.nonEmpty && last.nonEmpty)
    // same purchases, same total revenue — attribution reshuffles credit,
    // never creates or destroys it
    assert(first.map(_.getLong(2)).sum == last.map(_.getLong(2)).sum)
    assert(math.abs(first.map(_.getDouble(3)).sum -
      last.map(_.getDouble(3)).sum) < 1e-6)
    // a purchase has a first touch iff it has a last touch, so the
    // '(none)' bucket is identical under both models
    val noneF = first.find(_.getString(1) == "(none)").map(_.getLong(2)).getOrElse(0L)
    val noneL = last.find(_.getString(1) == "(none)").map(_.getLong(2)).getOrElse(0L)
    assert(noneF == noneL)
  }
}
