package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `graph_jaccard_capped` (round 16, VERDICT r15 task 3): the df-capped
  * production form of graph_jaccard. Two contracts pinned here:
  *
  *  1. CAP-FREE IDENTITY — on a corpus whose max part fan-out is under
  *     the cap (sf0.001: max 10 vs cap 24) the hub filter is the
  *     identity and the output is bit-identical to the exact form.
  *  2. CAPPED SEMANTICS — where the cap bites (sf0.01: 1270 of 2000
  *     parts exceed 24), the result is the EXACT algorithm on the
  *     hub-pruned graph: a scalar replay over the collected distinct
  *     (part, supplier) pairs with the same cap reproduces every row,
  *     and every surviving candidate pair is a pair the exact form also
  *     generates (capped sp ⊆ sp ⇒ candidate subset).
  */
class GraphJaccardCappedSpec extends AnyFunSuite {
  import TestSpark._

  private val cap = 24

  test("cap-free corpus (sf0.001, max fan-out 10): bit-identical to graph_jaccard") {
    val exact = operators.Clustering.graphJaccard(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val capped = operators.Clustering.graphJaccardCapped(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(capped === exact)
  }

  test("sf0.01 (cap bites): scalar replay over the pruned graph reproduces the frame") {
    val out = operators.Clustering.graphJaccardCapped(spark, sf001).collect()
    assert(out.length === 100, "the capped corpus still yields a full top-100")

    // scalar replay: distinct (part, supplier) pairs, hub parts (> cap
    // suppliers) removed, then per-supplier part sets over the SURVIVORS
    val sp = Tables.lineitem(spark, sf001)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val partDeg = sp.groupBy(_._1).map { case (p, xs) => p -> xs.length }
    val pruned = sp.filter { case (p, _) => partDeg(p) <= cap }
    assert(pruned.length < sp.length, "the cap must actually bite at sf0.01")
    val parts = pruned.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }

    out.foreach { r =>
      val (s1, s2, inter, d1, d2, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(s1 < s2)
      val (p1, p2) = (parts(s1), parts(s2))
      assert(inter === (p1 & p2).size.toLong, s"inter for ($s1,$s2)")
      assert(d1 === p1.size.toLong && d2 === p2.size.toLong,
        s"degrees for ($s1,$s2) must count PRUNED parts only")
      val replay = BigDecimal(inter.toDouble / (p1 | p2).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j === replay)
      assert(inter >= 1, "every emitted pair shares at least one sub-cap part")
    }
    // descending by rounded score with (s1, s2) tie-break
    val keys = out.map(r => (-r.getDouble(5), r.getLong(0), r.getLong(1))).toSeq
    assert(keys === keys.sorted)
  }

  test("candidate pairs ⊆ exact candidates, intersections never grow, and the prune bites") {
    // subset at the CANDIDATE grain (pre-top-100): capped sp ⊆ sp, so any
    // (s1, s2) co-occurring in the pruned graph also co-occurs in the
    // full one, with an intersection count that can only SHRINK. (The
    // sf0.01 fixture is dense — every supplier pair shares some sub-cap
    // part, so the pair SET itself does not shrink there; the counts do.)
    val sp = Tables.lineitem(spark, sf001)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val partDeg = sp.groupBy(_._1).map { case (p, xs) => p -> xs.length }
    def coCounts(pairs: Array[(Long, Long)]): Map[(Long, Long), Int] =
      pairs.groupBy(_._1).valuesIterator.flatMap { xs =>
        val sks = xs.map(_._2).sorted
        for (i <- sks.indices.iterator; k <- (i + 1) until sks.length)
          yield (sks(i), sks(k))
      }.toSeq.groupBy(identity).map { case (pr, occ) => pr -> occ.size }
    val exact = coCounts(sp)
    val capped = coCounts(sp.filter { case (p, _) => partDeg(p) <= cap })
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (pr, n) => assert(n <= exact(pr), s"inter grew for $pr") }
    assert(capped.values.sum < exact.values.sum,
      "the prune must remove hub co-occurrences at sf0.01")
  }
}
