package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** ts_ewma horizon bound (ADVICE r5): the round-5 closed form multiplied
  * by 1.25^tt, which overflows double at tt ≈ 3170 days (~8.7 years) and
  * turned every later ewma into NaN. The round-6 segmented rebase must
  * (a) stay finite on a multi-decade calendar and (b) agree with the
  * plain sequential recurrence y_t = 0.2·x_t + 0.8·y_{t−1} everywhere —
  * including across segment boundaries, where the carry term does the
  * work. */
class EwmaHorizonSpec extends AnyFunSuite {
  import TestSpark._

  test("ewma matches the sequential recurrence over 5000 days (past the old overflow)") {
    import spark.implicits._
    // deterministic daily series, one type, 5000 consecutive days
    val n = 5000
    val revs = (0 until n).map(i => ((i * 37 + 11) % 997 + 1).toDouble)
    val daily = revs.zipWithIndex
      .map { case (r, i) => ("alpha", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2000, 1, 1).plusDays(i).atStartOfDay()), r) }
      .toDF("event_type", "day", "rev")

    val got = TimeSeries.ewmaDaily(daily)
      .orderBy(col("day").asc)
      .collect().map(_.getDouble(3))

    // the definitionally-correct sequential recurrence
    val want = revs.scanLeft(Double.NaN) {
      case (prev, x) => if (prev.isNaN) x else 0.2 * x + 0.8 * prev
    }.drop(1)

    assert(got.length == n)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(!g.isNaN && !g.isInfinite, s"day $i: ewma is $g (overflow regression)")
      assert(math.abs(g - w) <= 5e-4 * math.max(1.0, math.abs(w)),
        s"day $i: segmented ewma $g != recurrence $w")
    }
  }

  test("ewma day-3500 sanity: old closed form would be NaN here") {
    import spark.implicits._
    val n = 3500
    val daily = (0 until n)
      .map(i => ("beta", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2000, 1, 1).plusDays(i).atStartOfDay()), 100.0))
      .toDF("event_type", "day", "rev")
    val last = TimeSeries.ewmaDaily(daily)
      .orderBy(col("day").desc).limit(1)
      .collect().head.getDouble(3)
    // constant input ⇒ ewma converges to the constant
    assert(math.abs(last - 100.0) < 1e-6, s"ewma of constant 100 series was $last")
  }
}
