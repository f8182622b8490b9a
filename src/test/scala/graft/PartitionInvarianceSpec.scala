package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Results must be independent of physical parallelism — the property
  * that makes a query's answer the same on local[4], local[32], and a
  * 1000-executor cluster. Exercised on the operators most at risk:
  * hash-id dedup (map-side xxhash64 encodings), iterative clustering
  * (driver-coordinated fixpoint), and the custom as-of operator
  * (co-partitioned merge), by re-running them on a sibling session with a
  * different shuffle-partition count and deranged input partitioning.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val alt = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "13")
    s
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("llm_minhash pairs are identical under a different shuffle partitioning") {
    assert(rows(LlmOps.llmMinhash(spark, sf0001)) ===
      rows(LlmOps.llmMinhash(alt, sf0001)))
  }

  test("llm_dedup_clusters labels are identical under a different shuffle partitioning") {
    assert(rows(Clustering.llmDedupClusters(spark, sf0001)) ===
      rows(Clustering.llmDedupClusters(alt, sf0001)))
  }

  test("native as-of join is identical under a different shuffle partitioning") {
    assert(rows(JoinsAdvanced.joinAsofNative(spark, sf0001)) ===
      rows(JoinsAdvanced.joinAsofNative(alt, sf0001)))
  }

  test("llm_simhash pairs are identical under a different shuffle partitioning") {
    assert(rows(LlmOpsExtra.llmSimhash(spark, sf0001)) ===
      rows(LlmOpsExtra.llmSimhash(alt, sf0001)))
  }
}
