package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Round-2 pipeline operators: dedup application, stratified sampling,
  * mix weights, repetition stats, contamination, heuristic filters. */
class LlmPipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("bigram LM: single-token and NULL-text docs are excluded, not a crash") {
    // Spark's sequence(1,0) DESCENDS to [1,0] (it is not empty), so a doc
    // with no bigrams would reach element_at(toks, 0) and throw where the
    // DuckDB oracle's generate_series(1,0) quietly yields no rows. The
    // operator's <2-token guard must make both engines agree: such docs
    // contribute nothing.
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "loneword", "en"),
      (3L, null.asInstanceOf[String], "en"),
      (4L, "", "en"))
      .toDF("doc_id", "text", "lang")
    val scored = LlmOpsPipeline.bigramDocLpFrom(spark, docs).collect()
    assert(scored.map(_.getLong(0)).toSet == Set(1L),
      "only the multi-token doc should be scored")
  }

  test("bigram LM: log-probs are negative and bounded by the vocabulary floor") {
    val rows = LlmOpsPipeline.llmBigramLm(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avg, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mx < 0.0, "probabilities are < 1, so log-probs must be negative")
      assert(mn <= avg && avg <= mx)
      // floor: even an unseen bigram scores ln(1/(c1+V)) > ln(1/(N+V))
      assert(mn > -25.0, s"implausible floor $mn")
    }
  }

  test("pack: total tokens conserved; fill never exceeds capacity by more than one doc") {
    val out = LlmOpsPipeline.llmPack(spark, sf0001).collect()
    val totalToks = out.map(_.getLong(4)).sum
    val expected = Tables.documents(spark, sf0001)
      .select(size(split(col("text"), " ")).cast("bigint").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(totalToks === expected, "packing must conserve every token")
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0, "contexts cannot be empty")
    }
  }

  test("dedup apply: kept + dropped per source sums to the source's doc count") {
    val out = LlmOpsPipeline.llmDedupApply(spark, sf0001)
      .withColumn("total", col("kept") + col("dropped"))
    val expected = Tables.documents(spark, sf0001)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val joined = out.join(expected, "source")
      .filter(col("total") =!= col("n")).count()
    assert(joined === 0, "kept+dropped must equal per-source doc count")
    // dropped docs are exactly the distinct higher-id members of near-dup pairs
    val droppedTotal = out.agg(sum("dropped")).head().getLong(0)
    val distinctB = LlmOps.llmDedupNear(spark, sf0001)
      .select("b_id").distinct().count()
    assert(droppedTotal === distinctB)
  }

  test("stratified sample: at most 20 per lang, ranks dense from 1, deterministic") {
    val out = LlmOpsPipeline.llmStratifiedSample(spark, sf0001).collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      val rns = rows.map(_.getInt(1)).sorted.toSeq
      assert(rns === (1 to rns.size), "ranks must be dense from 1")
      assert(rns.size <= 20)
    }
    val again = LlmOpsPipeline.llmStratifiedSample(spark, sf0001).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ===
      again.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq,
      "sample must be reproducible")
  }

  test("mix weights: shares sum to ~1 and tokens are positive") {
    val rows = LlmOpsPipeline.llmMixWeights(spark, sf0001).collect()
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("repetition: avg_rep in [0,1), avg_dom >= 1/ntoks bound") {
    val rows = LlmOpsPipeline.llmRepetition(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rep = r.getDouble(2); val dom = r.getDouble(3)
      assert(rep >= 0.0 && rep < 1.0, s"rep=$rep")
      assert(dom > 0.0 && dom <= 1.0, s"dom=$dom")
    }
  }

  test("contamination: benchmark docs excluded, ratio consistent with counts") {
    val rows = LlmOpsPipeline.llmContamination(spark, sf0001).collect()
    val docsTotal = rows.map(_.getLong(1)).sum
    val nonBench = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 100 =!= 0).count()
    assert(docsTotal === nonBench, "benchmark docs must be excluded from the census")
    rows.foreach { r =>
      val ratio = r.getDouble(3)
      val expect = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ratio - expect) < 1e-9)
    }
  }

  test("heuristic filter: flag counts never exceed docs; pass <= docs - max(flag)") {
    val rows = LlmOpsPipeline.llmHeuristicFilter(spark, sf0001).collect()
    rows.foreach { r =>
      val docs = r.getLong(1)
      val flags = Seq(r.getLong(2), r.getLong(3), r.getLong(4))
      val pass = r.getLong(5)
      assert(flags.forall(_ <= docs))
      assert(pass <= docs - flags.max, "a doc with any flag cannot pass")
    }
  }

  test("doc_split: chunks tile each doc with exact 16-token overlap") {
    import org.apache.spark.sql.functions._
    // re-derive the chunk rows (the census aggregates them away) and
    // check the tiling invariant per doc: all non-final chunks are 64
    // tokens, starts advance by 48, the final chunk ends at ntok.
    val chunks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("ntok", size(col("toks")))
      .withColumn("k", when(col("ntok") <= 64, lit(1))
        .otherwise(lit(1) + expr("(ntok - 17) div 48")))
      .withColumn("ci", explode(sequence(lit(0), col("k") - 1)))
      .withColumn("start", col("ci") * 48)
      .withColumn("chunk_tok", least(lit(64), col("ntok") - col("start")))
      .select(col("doc_id"), col("ntok").cast("long"), col("k").cast("long"),
        col("ci").cast("long"), col("start").cast("long"), col("chunk_tok").cast("long"))
      .collect()
    assert(chunks.nonEmpty)
    chunks.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ntok = rows.head.getLong(1)
      val k = rows.head.getLong(2)
      assert(rows.length == k)
      rows.sortBy(_.getLong(3)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(4) == i * 48L, "stride must be 48")
        val len = r.getLong(5)
        if (i < k - 1) assert(len == 64L, "non-final chunks are full windows")
        else assert(r.getLong(4) + len == ntok, "final chunk must end at ntok")
        assert(len >= 1L)
      }
    }
  }
}
