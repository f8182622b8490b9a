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

  test("llm_pack sharded cumsum is identical under a different shuffle partitioning") {
    assert(rows(LlmOpsPipeline.llmPack(spark, sf0001)) ===
      rows(LlmOpsPipeline.llmPack(alt, sf0001)))
  }

  test("llm_stratified_sample two-phase top-k is identical under a different shuffle partitioning") {
    assert(rows(LlmOpsPipeline.llmStratifiedSample(spark, sf0001)) ===
      rows(LlmOpsPipeline.llmStratifiedSample(alt, sf0001)))
  }

  test("llm_dedup_clusters uses RELIABLE (on-disk) checkpoints, not block-manager blocks") {
    Clustering.llmDedupClusters(spark, sf0001).count()
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.isDefined, "checkpoint dir must be pinned by the CC loop")
    // reliable checkpoints materialize as rdd-* directories on the
    // filesystem — the property localCheckpoint (executor memory) lacks
    val files = new java.io.File(new java.net.URI(dir.get).getPath).listFiles()
    assert(files != null && files.exists(_.getName.startsWith("rdd-")),
      s"expected rdd-* checkpoint data under $dir")
  }
}
