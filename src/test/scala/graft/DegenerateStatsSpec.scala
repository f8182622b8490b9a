package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 tiny-corpus sweep conventions: every hand-rolled statistic
  * must degrade to NULL on its undefined shapes (n=1 groups, zero
  * variance, one-sided samples, empty censuses) exactly like the DuckDB
  * oracle's division-by-zero — never throw the session's ANSI
  * DIVIDE_BY_ZERO mid-job. The sweep (tools/crafted_sweeps.py tiny)
  * certifies all 295 oracle-able queries end-to-end; this spec pins the
  * shared kernel conventions at unit grain so a regression fails fast
  * in ScalaTest rather than only driver-side. */
class DegenerateStatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("corrSafe: NULL on zero variance and on n=1; matches native corr " +
    "on well-shaped input") {
    val flat = Seq((1.0, 2.0), (1.0, 3.0), (1.0, 4.0)).toDF("x", "y")
    assert(flat.agg(operators.Aggregates.corrSafe(col("x"), col("y")))
      .head().isNullAt(0), "constant column => NULL, not ANSI error")
    val single = Seq((1.0, 2.0)).toDF("x", "y")
    assert(single.agg(operators.Aggregates.corrSafe(col("x"), col("y")))
      .head().isNullAt(0), "n=1 => NULL")
    val ok = Seq((1.0, 2.0), (2.0, 4.5), (3.0, 5.5), (4.0, 9.0)).toDF("x", "y")
    val r = ok.agg(
      round(operators.Aggregates.corrSafe(col("x"), col("y")), 6).as("safe"),
      round(corr(col("x"), col("y")), 6).as("native")).head()
    assert(r.getDouble(0) === r.getDouble(1),
      "well-shaped input: identical to native corr at the rounding grain")
  }

  test("native corr really does ANSI-throw on zero variance (the hazard " +
    "corrSafe exists for)") {
    val flat = Seq((1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    val ex = intercept[Throwable] {
      flat.agg(corr(col("x"), col("y"))).head()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(_.contains("DIVIDE_BY_ZERO")),
      "if this stops throwing, corrSafe can be retired to native corr")
  }

  test("nullif division convention: zero denominators go NULL like the " +
    "oracle, NULL numerators propagate before the zero check") {
    val r = Seq((0.0, 0.0)).toDF("a", "b")
      .select(
        (col("a") / nullif(col("b"), lit(0.0))).as("zero_den"),
        (lit(null).cast("double") / col("b")).as("null_num"))
      .head()
    assert(r.isNullAt(0), "x / nullif(0, 0) => NULL")
    assert(r.isNullAt(1), "NULL / 0 => NULL (no ANSI error)")
  }
}
