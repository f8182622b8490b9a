package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input pins (round-11 session 2): a real pipeline meets
  * empty partitions — an empty day of data, a filtered-to-nothing
  * source — and the three driver-side scalar reads in the suite
  * (k-core's adaptive-k percentile, BPE's per-round argmax, z-order's
  * max-key scaling constants) all crashed on them (NULL aggregates /
  * empty argmax head()). Fixture dirs here are 0-row slices of sf0.001,
  * so every schema is exactly the production one. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_empty_").toString
    Seq("lineitem", "documents", "events", "customer").foreach { t =>
      Tables.byName(spark, TestSpark.sf0001, t).limit(0)
        .coalesce(1).write.parquet(s"$d/$t.parquet")
    }
    d
  }

  test("llm_bpe_encode on an empty corpus is empty, not a crash") {
    // empty dict → no trainable merges → nothing to encode; the lang
    // aggregate over zero joined rows is the empty frame
    assert(operators.BpeTrain.llmBpeEncode(spark, emptyDir).collect().isEmpty)
  }

  test("dq_k_anon over an empty population is empty, not a crash") {
    // zero QI groups → the literal spine has nothing to explode against;
    // same answer as the oracle's CROSS JOIN with an empty group table
    assert(operators.DataQuality.dqKAnon(spark, emptyDir).collect().isEmpty)
  }

  test("dq_l_diversity over an empty population is empty, not a crash") {
    assert(operators.DataQuality.dqLDiversity(spark, emptyDir).collect().isEmpty)
  }

  test("dq_t_closeness over an empty population is empty, not a crash") {
    assert(operators.DataQuality.dqTCloseness(spark, emptyDir).collect().isEmpty)
  }

  test("graph_kcore of an empty graph is the zero row, not a crash") {
    val r = operators.Clustering.graphKcore(spark, emptyDir).collect()
    assert(r.length == 1)
    assert((0 to 4).map(r(0).getLong) == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("llm_bpe_train on an empty corpus ends training instead of throwing") {
    val out = operators.BpeTrain.llmBpeTrain(spark, emptyDir).collect()
    assert(out.isEmpty, s"no merges derivable from an empty dict, got ${out.length}")
  }

  test("agg_quantile_union of an empty corpus yields the union row with " +
    "null estimates, not a crash") {
    val out = operators.Aggregates.aggQuantileUnion(spark, emptyDir).collect()
    // no sources → no per-source rows; the union row still assembles
    // (empty-map state, null audit percentiles) — a null estimate is the
    // honest answer to "p50 of nothing"
    assert(out.length == 1 && out(0).getString(0) == "__union__")
    assert(out(0).isNullAt(1) && out(0).isNullAt(2), "null est/exact p50")
    assert(out(0).getInt(6) == 0, "zero sketch buckets")
  }

  test("seq_nfa_pred over an empty event stream matches nothing, not a crash") {
    // the p90 guard aggregate over zero purchases is a null threshold;
    // the refinement and the automaton must both tolerate it
    assert(operators.EventPattern.seqNfaPred(spark, emptyDir).collect().isEmpty)
  }

  test("sink_zorder of an empty table writes an empty rewrite, not a crash") {
    val out = operators.SourcesSinks.sinkZorder(spark, emptyDir).collect()
    // the declared result is a census of the rewritten files — whatever
    // its shape, it must be computable and describe zero rows
    assert(out.forall(r => (0 until r.length).forall(i =>
      r.isNullAt(i) || !r.get(i).isInstanceOf[Long] || r.getLong(i) >= 0L)))
  }
}
