package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins ScaleIdioms.ntileFromRank — the closed-form bucket the two-level
  * rank rewrite substitutes for `ntile(k) OVER (ORDER BY …)` — against
  * Spark's own ntile, for every n in 1..64 at several k: the remainder
  * distribution (first n mod k buckets one row larger) is exactly the
  * part a hand formula gets subtly wrong, and rfm_segments /
  * cust_migration hash-match their DuckDB oracles only if every bucket
  * boundary agrees. */
class NtileFormulaSpec extends AnyFunSuite {
  import TestSpark._

  test("ntileFromRank equals Spark ntile for n in 1..64, k in {2,3,5,7}") {
    val session = spark
    import session.implicits._
    for (k <- Seq(2, 3, 5, 7)) {
      // one frame holding every n: rows (n, rn) for rn <= n — each n is
      // its own ntile partition, so a single pass covers all cases
      val rows = (1 to 64).flatMap(n => (1 to n).map(rn => (n, rn.toLong)))
      val df = rows.toDF("n", "rn")
      val expected = ntile(k).over(
        Window.partitionBy("n").orderBy(col("rn").asc))
      val mismatches = df
        .withColumn("exp", expected)
        .withColumn("got",
          operators.ScaleIdioms.ntileFromRank(k, col("rn"), col("n")).cast("int"))
        .filter(col("exp") =!= col("got"))
        .count()
      assert(mismatches == 0L, s"k=$k: closed-form ntile diverges from Spark's")
    }
  }
}
