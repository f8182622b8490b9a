package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** SpaceSaving top-k sketch: exact below capacity, heavy-hitter guarantee
  * above it, merge across partitions. */
class TopKSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("below capacity the sketch equals the exact top-10") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toks.agg(graft.functions.sim.topkSketch(col("tok")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch === exact)
  }

  test("above capacity every true heavy hitter survives (SpaceSaving guarantee)") {
    // 10 hot terms × 500 + 200 cold terms × 5 = 6000 rows, N/m = 94 < 500
    val rows =
      (0 until 10).flatMap(i => Seq.fill(500)(s"hot$i")) ++
      (0 until 200).flatMap(j => Seq.fill(5)(f"cold$j%03d"))
    val df = rows.toDF("tok").repartition(7) // force multi-partition merges
    val top = df.agg(graft.functions.sim.topkSketch(col("tok")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.term")).collect().map(_.getString(0)).toSet
    assert((0 until 10).map(i => s"hot$i").toSet.subsetOf(top),
      s"all hot terms must be retained, got $top")
  }

  test("non-string children are rejected at analysis, not mid-job " +
    "(round-13 review: update casts to UTF8String; countmin_freq probes " +
    "hash with the child's type)") {
    val longs = Seq(1L, 2L, 3L).toDF("v")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      longs.agg(graft.functions.sim.topkSketch(col("v"))).head()
    }
    assert(e1.getMessage.contains("string"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      longs.agg(graft.functions.sim.countMinFreq(col("v"), Seq("1"))).head()
    }
    assert(e2.getMessage.contains("string"))
  }
}
