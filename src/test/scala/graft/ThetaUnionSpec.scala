package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{sim, KmvState}

/** agg_theta_union (round-12, VERDICT r11 task 2): mergeable KMV states
  * and their cross-source column-algebra union.
  *
  * The load-bearing claim is STATE-level: the algebraic union of
  * per-source sketch states (array_distinct ∪ flatten ∪ array_sort ∪
  * slice k) is BIT-equal to the state one direct corpus-wide sketch
  * builds — integer equality, no float tolerance — so re-aggregating
  * sketches across sources/partitions/days loses nothing vs re-scanning.
  * Estimate accuracy, buffer-level merge commutativity, and partition
  * invariance ride alongside.
  */
class ThetaUnionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("union state == direct corpus-wide sketch state (bit-equal)") {
    val k = 64
    val docs = Tables.documents(spark, sf001).select("source", "text")
    val unioned = docs.groupBy("source")
      .agg(sim.kmvState(col("text"), k).as("state"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("state"))))),
        1, k).as("state"))
      .head().getSeq[Long](0)
    val direct = docs.agg(sim.kmvState(col("text"), k).as("state"))
      .head().getSeq[Long](0)
    assert(unioned === direct,
      "KMV merge property: global k-smallest ⊆ union of per-source k-smallest")
  }

  test("declared query: union row estimate within 15% of exact audit; " +
    "below-k sources exact") {
    val rows = operators.Aggregates.aggThetaUnion(spark, sf001).collect()
    assert(rows.nonEmpty)
    val union = rows.filter(_.getString(0) == "__union__")
    assert(union.length === 1)
    rows.foreach { r =>
      val est = r.getLong(1); val exact = r.getLong(2); val size = r.getInt(3)
      if (size < 256) assert(est === exact,
        s"${r.getString(0)}: below-k sketch must be exact")
      else assert(math.abs(est - exact).toDouble / exact <= 0.15,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("buffer-level merge is commutative: merge(a,b) == merge(b,a)") {
    val agg = KmvState(org.apache.spark.sql.catalyst.expressions.Literal(0L), k = 8)
    def buf(vs: Long*): java.util.TreeSet[java.lang.Long] = {
      val b = agg.createAggregationBuffer()
      vs.foreach(v => b.add(java.lang.Long.valueOf(v)))
      b
    }
    // overlapping buffers larger than k after union — truncation path
    val a1 = buf(1L, 5L, 9L, 13L, 17L, 21L, 25L, 29L)
    val b1 = buf(2L, 5L, 10L, 13L, 18L, 21L, 26L, 33L)
    val a2 = buf(1L, 5L, 9L, 13L, 17L, 21L, 25L, 29L)
    val b2 = buf(2L, 5L, 10L, 13L, 18L, 21L, 26L, 33L)
    val ab = agg.merge(a1, b1)
    val ba = agg.merge(b2, a2)
    assert(ab.toArray === ba.toArray)
    assert(ab.size <= 8)
  }

  test("partition invariance: repartition(1) vs 32 vs hash → identical state") {
    val df = (0 until 30000).map(i => (i * 2654435761L) % 9000).toDF("v")
    def state(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(sim.kmvState(col("v"), 64)).head().getSeq[Long](0)
    val a = state(df.repartition(1))
    val b = state(df.repartition(32))
    val c = state(df.repartition(7, col("v")))
    assert(a === b)
    assert(b === c)
  }

  test("usable from SQL via extension registration") {
    Tables.registerAll(spark, sf0001)
    val st = spark.sql("SELECT kmv_state(user_id) FROM events")
      .head().getSeq[Long](0)
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM events")
      .head().getLong(0)
    assert(st.length === math.min(exact, 256L).toInt)
    assert(st === st.sorted, "state array must be ascending (flipped order)")
  }
}
