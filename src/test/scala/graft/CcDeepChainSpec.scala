package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deep-fixpoint pin for the star-contraction connected components
  * behind llm_dedup_clusters / graph_cc_sizes (round-11 session 2,
  * sibling of KcoreDeepPeelSpec): fixture near-dup graphs are unions of
  * DENSE blocks, so the min-label fixpoint converges almost immediately
  * and the loop's depth behavior (lazy odd rounds, checkpointed even
  * rounds, convergence probed on files) was never stressed. This corpus
  * is the adversarial opposite — a 64-document CHAIN where doc i is
  * near-dup ONLY of doc i±1 (sliding 10-token windows: adjacent Jaccard
  * = 9/11 ≈ 0.818 ≥ 0.8, two-apart = 8/12 ≈ 0.667 < 0.8), whose
  * transitive closure is ONE 64-doc cluster reachable only through
  * ~log-depth label propagation. A dense 5-clone block rides along to
  * keep the easy shape covered, plus pairless singletons (which must NOT
  * appear in the size census at all). Fragmented labels would surface as
  * multiple smaller clusters — the census pins exactly two rows. */
class CcDeepChainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ccchain_").toString
    def windowDoc(i: Int): String = (i until i + 10).map(t => s"tok$t").mkString(" ")
    val chain = (0 until 64).map(i => (1000L + i, windowDoc(i)))
    val clones = (0 until 5).map(j => (2000L + j, "alpha beta gamma delta epsilon"))
    val loners = Seq((3000L, "completely unique words here now"),
      (3001L, "another disjoint vocabulary entirely folks"))
    (chain ++ clones ++ loners)
      .map { case (id, text) => (id, text, "en", 500L) }
      .toDF("doc_id", "text", "lang", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("a 64-doc near-dup chain labels as ONE cluster through the deep fixpoint") {
    val sizes = operators.Clustering.graphCcSizes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sizes.toSeq == Seq((5L, 1L, 5L), (64L, 1L, 64L)),
      s"expected exactly the 5-clone block and the unfragmented 64-chain, got ${sizes.toSeq}")
  }
}
