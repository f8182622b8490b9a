package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deep-cascade pin for graph_kcore's incremental delta-peel (round-11
  * session 2): on every driver fixture AND the 10× stress frame the peel
  * converges in TWO rounds, so the incremental degree-decrement logic —
  * survivors' degrees updated by each round's removals instead of
  * recomputed — had never been exercised across a long cascade, exactly
  * where incremental state could drift from recompute semantics. This
  * crafted bipartite graph forces a ~9-round peel: a K3,3 (all degrees
  * 3) with an 8-node path tail hung off one part. Part degrees
  * [1,2,2,2,3,3,4] put the adaptive k (median part degree,
  * percentile_disc) at exactly 2, so the path's leaf starts the cascade
  * and each round removes ONE node walking inward until the tail is
  * gone; the K3,3 survives untouched. The engine result is checked
  * against an independent recompute-from-scratch replay (the
  * Round8OpsSpec loop) plus the hand-derived core. */
class KcoreDeepPeelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_kcore_").toString
    val k33 = for (p <- 1L to 3L; s <- 1L to 3L) yield (p, s)
    // path: part1 - s4 - p5 - s5 - p6 - s6 - p7 - s7 - p8
    val path = Seq((1L, 4L), (5L, 4L), (5L, 5L), (6L, 5L),
      (6L, 6L), (7L, 6L), (7L, 7L), (8L, 7L))
    (k33 ++ path).toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("engine delta-peel == recompute replay across a ~9-round cascade") {
    val r = operators.Clustering.graphKcore(spark, dir).head()
    val (k, nParts, nSupps, nEdges, rounds) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(k == 2, s"adaptive median-degree k: got $k")
    // the whole point: a cascade far deeper than any fixture's 2 rounds
    assert(rounds >= 8, s"deep cascade expected, peel took only $rounds rounds")
    // hand-derived core: the K3,3 survives, the tail peels away entirely
    assert((nParts, nSupps, nEdges) == ((3L, 3L, 9L)),
      s"core census ($nParts, $nSupps, $nEdges)")
    // independent recompute-from-scratch replay (no incremental state)
    var edges = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r2 => (r2.getLong(0) * 2, r2.getLong(1) * 2 + 1)).toSet
    var changed = true
    while (changed) {
      val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val coreNodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(nParts == coreNodes.count(_ % 2 == 0).toLong, "part census vs replay")
    assert(nSupps == coreNodes.count(_ % 2 == 1).toLong, "supplier census vs replay")
    assert(nEdges == edges.size.toLong, "edge census vs replay")
  }
}
