package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 optimization equivalence pins. Each rewrite this round changed
  * an operator's INTERNALS only; these tests replay the pre-round-17
  * formulation independently and require bit-identical output, so a future
  * edit that lets the optimized form drift from the specified algorithm
  * fails here rather than at the oracle gate.
  *
  *  - graph_jaccard / graph_jaccard_capped: clique expansion from per-part
  *    sorted supplier arrays replaced the pk self-equi-join (guide §2.3 —
  *    half the pair stream, one fewer corpus exchange). Reference here IS
  *    the old self-join, spelled out verbatim.
  *  - graph_label_prop: superstep 1 from identity labels folded to
  *    min-neighbor (every (dst, lbl) message count is exactly 1 on a
  *    distinct arc set). Reference replays the UNFOLDED superstep from
  *    identity labels through the same argmax.
  */
class Round17OptSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def pairs(dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()

  private def jaccardReference(dir: String, cap: Option[Int]): DataFrame = {
    val sp0 = pairs(dir)
    val sp = cap match {
      case Some(c) =>
        val keep = sp0.groupBy("pk").agg(count(lit(1)).as("dp"))
          .filter(col("dp") <= c).select("pk")
        sp0.join(keep, "pk")
      case None => sp0
    }
    val deg = sp.groupBy("sk").agg(count(lit(1)).as("d"))
    val co = sp.select(col("pk"), col("sk").as("s1"))
      .join(sp.select(col("pk"), col("sk").as("s2")), "pk")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
    co.join(broadcast(deg.select(col("sk").as("s1"), col("d").as("d1"))), "s1")
      .join(broadcast(deg.select(col("sk").as("s2"), col("d").as("d2"))), "s2")
      .select(col("s1"), col("s2"), col("inter"), col("d1"), col("d2"),
        round(col("inter").cast("double") / (col("d1") + col("d2") - col("inter")), 6)
          .as("jacc"))
      .orderBy(col("jacc").desc, col("s1").asc, col("s2").asc)
      .limit(100)
  }

  test("graph_jaccard: clique expansion ≡ the r16 self-join form (sf0.001 + sf0.01)") {
    for (dir <- Seq(sf0001, sf001)) {
      val got = rows(SparkEntry.queries("graph_jaccard")(spark, dir))
      val ref = rows(jaccardReference(dir, None))
      assert(got == ref, s"graph_jaccard diverged from the self-join reference at $dir")
    }
  }

  test("graph_jaccard_capped: array-grain hub prune ≡ the r16 census+join prune") {
    for (dir <- Seq(sf0001, sf001)) {
      val got = rows(SparkEntry.queries("graph_jaccard_capped")(spark, dir))
      val ref = rows(jaccardReference(dir, Some(24)))
      assert(got == ref, s"graph_jaccard_capped diverged from the join-prune reference at $dir")
    }
  }

  test("graph_label_prop: min-neighbor fold ≡ the unfolded identity-label superstep") {
    for (dir <- Seq(sf0001, sf001)) {
      // unfolded reference: identity labels through TWO general supersteps
      // over the same symmetric arc set (p → 2k / s → 2k+1 encoding)
      val sp = pairs(dir)
        .select((col("pk") * 2).as("p"), (col("sk") * 2 + 1).as("s"))
      val edges = sp.select(col("p").as("src"), col("s").as("dst"))
        .unionAll(sp.select(col("s").as("src"), col("p").as("dst")))
      var labels = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      for (_ <- 1 to 2) {
        labels = labels
          .join(edges, col("node") === col("src"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst").as("node"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("lbl"))
      }
      val ref = rows(labels
        .groupBy("lbl").agg(count(lit(1)).as("n_nodes"))
        .select(
          when(col("lbl") % 2 === 0, concat(lit("p"), (col("lbl") / 2).cast("long")))
            .otherwise(concat(lit("s"), ((col("lbl") - 1) / 2).cast("long")))
            .as("community"),
          col("n_nodes"))
        .orderBy(col("n_nodes").desc, col("community").asc)
        .limit(20))
      val got = rows(SparkEntry.queries("graph_label_prop")(spark, dir))
      assert(got == ref, s"graph_label_prop diverged from the unfolded superstep at $dir")
    }
  }
}
