package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-regression guard: every declared query's physical plan is reduced
  * to a small fingerprint — shuffle-exchange count, broadcast-exchange
  * count, parquet-scan count, and how many of those scans carry pushed
  * filters — and frozen against a committed snapshot
  * (src/test/resources/plan_snapshot.json). A future edit that silently
  * adds a shuffle, drops a broadcast, or loses scan pushdown fails here
  * long before it shows up as a bench regression.
  *
  * AQE is disabled on the snapshot session so the fingerprint is the
  * STATIC plan Catalyst produces (AQE only re-plans at runtime, and its
  * plan is input-size-dependent — not a stable snapshot target).
  *
  * Regenerate after an INTENTIONAL plan change with:
  *   PLAN_SNAPSHOT_REGEN=1 sbt "testOnly graft.PlanSnapshotSpec"
  * and commit the diff — the review of that diff IS the plan review.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val session = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  // One planning pass for BOTH tests: several constructors are not
  // side-effect-free (graph_pagerank's AQE-off materialize, jdbc_sink's
  // Derby write, llm_dedup_clusters' iterative fixpoint), so the NLJ
  // guard must reuse these plans, not re-construct every query.
  // The "#weights"/"#inner" entries fingerprint the PRE-materialization
  // plans of queries whose declared form is a bounded-result scan
  // (ADVICE r9: a materialize/checkpoint truncates the declared plan,
  // so the corpus-scale scans — and their pushdowns — would otherwise
  // be invisible to both guards here).
  private lazy val innerPlans: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "agg_weighted_median#weights" ->
      operators.Aggregates.weightedMedianWeights(session, sf0001),
    "agg_weighted_median#inner" ->
      operators.Aggregates.aggWeightedMedianPlan(session, sf0001),
    "agg_pareto#inner" -> operators.Aggregates.aggParetoPlan(session, sf0001),
    // ADVICE r10: these three execute their whole corpus-scale lineage
    // inside an AQE-off materialize, so the declared-plan fingerprint is
    // a bounded result scan; the #inner entries keep the real scans,
    // joins and supersteps under both guards.
    "basket_rules#inner" -> operators.Analytics2.basketRulesPlan(session, sf0001),
    "graph_pagerank#inner" -> operators.Clustering.pagerankPlan(session, sf0001),
    "graph_label_prop#inner" -> operators.Clustering.labelPropPlan(session, sf0001),
    // round 17: the PQ report chain moved behind a size-derived
    // materialize; the #inner entry keeps its corpus scan + broadcast
    // assignment under both guards (trains the codebook as a side effect)
    "llm_emb_pq#inner" -> operators.LlmOpsExtra.llmEmbPqPlan(session, sf0001))

  private lazy val plans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    (SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(session, sf0001)
    } ++ innerPlans)
      .map { case (name, df) => name -> df.queryExecution.executedPlan }

  private def fingerprint(plan: org.apache.spark.sql.execution.SparkPlan): Seq[Int] = {
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }.size
    val broadcasts = plan.collect { case e: BroadcastExchangeExec => e }.size
    val scans = plan.collect { case s: FileSourceScanExec => s }
    val pushed = scans.count(_.metadata.get("PushedFilters").exists(_ != "[]"))
    Seq(shuffles, broadcasts, scans.size, pushed)
  }

  private def render(rows: Seq[(String, Seq[Int])]): String =
    rows.map { case (n, f) => s""""$n": [${f.mkString(",")}]""" }
      .mkString("{\n", ",\n", "\n}\n")

  test("all declared queries match the committed plan snapshot") {
    val snapPath = java.nio.file.Paths.get("src/test/resources/plan_snapshot.json")
    val actual = plans.map { case (name, plan) => name -> fingerprint(plan) }
    val rendered = render(actual)
    if (sys.env.contains("PLAN_SNAPSHOT_REGEN") ||
        !java.nio.file.Files.exists(snapPath)) {
      java.nio.file.Files.createDirectories(snapPath.getParent)
      java.nio.file.Files.writeString(snapPath, rendered)
      info(s"snapshot (re)generated at $snapPath — commit it")
    } else {
      val expected = java.nio.file.Files.readString(snapPath)
      if (rendered != expected) {
        val exp = expected.linesIterator.toSet
        val act = rendered.linesIterator.toSet
        val diff = ((act -- exp).map("+ " + _) ++ (exp -- act).map("- " + _))
          .toSeq.sorted.mkString("\n")
        fail(s"plan fingerprints drifted from snapshot " +
          s"([shuffles, broadcasts, scans, pushed-filter scans]):\n$diff\n" +
          "If intentional, regenerate with PLAN_SNAPSHOT_REGEN=1 and commit.")
      }
    }
  }

  /** Negative guard (round-5 verdict ask #8): a snapshot diff can be
    * waved through with PLAN_SNAPSHOT_REGEN, but a NEW nested-loop or
    * cartesian join in a query that never had one is a scale-killer and
    * must fail outright. The allowlist is every query whose nested-loop
    * is intentional: either a tiny-side cross pattern (both sides
    * bounded: k-row seeds, label sets) or a 1-row broadcast scalar
    * (count/total carried as a crossJoin(broadcast(agg)) — the
    * no-driver-action idiom used instead of collect()). */
  test("no query outside the allowlist plans a nested-loop or cartesian join") {
    val allowed = Set(
      // tiny-side cross patterns (PLANS.md)
      "join_cross", "llm_cosine_knn", "llm_knn_join", "llm_tfidf",
      "stream_late_data",
      // all-pairs mining over the codebook-scale embedding table; at
      // corpus scale the pair stream swaps to the LSH/IVF candidate
      // generators with the same aggregate (scaladoc)
      "llm_hard_negatives",
      // (llm_ann_ivf left this list in round 8: the trained codebook now
      // rides into the plan as a literal pivot array folded map-side, so
      // the DECLARED plan has no crossJoin at all.)
      // 1-row broadcast scalar: crossJoin(broadcast(<global agg>)), the
      // no-driver-action way to carry a count/total into every row.
      // (llm_bigram_lm / llm_quality_buckets left this list in round 7:
      // their V-scalar crossJoin now executes inside the checkpointed
      // bigramDocLp construction, so the DECLARED plan is checkpoint-scan
      // + aggregate with no nested loop.)
      // (graph_pagerank left this list in round 10: its superstep chain —
      // N now a denormalized column of the shared graphEdges memo — runs
      // inside an AQE-off materialize, so the DECLARED plan is a 20-row
      // scan + sort with no nested loop.)
      "llm_mix_weights",
      "hist_eqdepth", "llm_vocab_coverage",
      // llm_source_kl: crossJoin(broadcast(sum over the top-50 corpus
      // table)) — the KL reference total N carried as a 1-row scalar
      "llm_source_kl",
      // llm_bm25_retrieve: crossJoin(broadcast(corpus n_docs/avglen
      // stats)) — the BM25 normalization constants as a 1-row scalar
      "llm_bm25_retrieve",
      // wave-8 1-row broadcast scalars: dq_benford carries the order
      // count, dq_drift_ks the two ECDF totals, llm_source_psi the
      // (bin-count, corpus-total) pair AND the sources × observed-bins
      // dense spine — the spine cross is vocabulary-sized by design
      // (drift needs zero-count bins to contribute to the sum)
      "dq_benford", "dq_drift_ks", "llm_source_psi",
      // wave-9: hist_kde crosses the literal 21-point grid with the
      // ~100-row bin frame (bins × points ≈ 2100 rows of arithmetic —
      // the binned-KDE trade) and carries the 1-row total; llm_bigram_pmi
      // carries the two 1-row occurrence totals (N1, N2) as scalars
      "hist_kde", "llm_bigram_pmi",
      // wave-10: agg_chisq carries the 1-row contingency grand total
      "agg_chisq",
      // wave-11: ts_cross_corr crosses the 7-literal lag spine with the
      // day-grain frame; llm_dataset_card assembles three 1-row/1-row
      // aggregates (base stats × vocab count × top source)
      "ts_cross_corr", "llm_dataset_card",
      // wave-12: ts_periodogram crosses the literal 10-harmonic spine
      // with the day-grain frame (types × days × 10 — vocabulary-sized)
      "ts_periodogram",
      // wave-13: llm_perplexity carries the corpus p90 cross-entropy
      // threshold as a 1-row broadcast scalar against the doc-grain frame
      "llm_perplexity",
      // wave-16: dq_freshness carries the corpus watermark (global max
      // ts) as a 1-row broadcast scalar against the event stream
      "dq_freshness",
      // wave-17: ts_decay anchors decay ages at the same 1-row watermark
      "ts_decay",
      // wave-21: bill_aging ages receivables against the 1-row ledger date
      "bill_aging",
      // round-9: llm_knn_classify crosses the corpus with the BOUNDED
      // 20-query broadcast batch (the llm_knn_join contract); at 100 TB
      // the scoring pass swaps to the IVF/LSH candidate join (scaladoc).
      // llm_source_hhi carries the 1-row (docs, tokens) grand totals as
      // a broadcast scalar into the 20-row source frame.
      "llm_knn_classify", "llm_source_hhi",
      // round-9 wave 3: agg_pareto carries the 1-row (total cents, n)
      // scalar into the customer-grain rank frame
      // (round 10: agg_pareto moved to its #inner entry — the declared
      // plan is a bounded-result scan, and the scalar crossJoin now
      // executes inside the AQE-off result write)
      "agg_pareto#inner",
      // round-9 wave 4: rfm_segments anchors recency at the 1-row
      // corpus ledger date (bill_aging's pattern)
      "rfm_segments",
      // round-9 wave 5: llm_dedup_funnel assembles its census from four
      // 1-row stage counts (dataset_card pattern; round 10 measured the
      // tagged-union-in-one-write alternative 3× slower contended — AQE
      // exchange reuse is what makes this form's 15 stage jobs cheap)
      "llm_dedup_funnel",
      // (basket_rules left this list in round 10: the basket total is now
      // a denormalized column of the materialized basket artifact, so the
      // declared plan has no scalar crossJoin.)
      // round-11: basket_rules' PRE-materialization build carries that
      // 1-row basket-total scalar — fingerprinted under its #inner entry
      "basket_rules#inner",
      // round-9 wave 7: bill_price_index carries the 1-row base-year
      // (c0, q0) pair as a broadcast scalar into the year-grain frame
      "bill_price_index",
      // round-9 wave 8: llm_vocab_growth carries the 1-row corpus-size
      // scalar into the map-side batch assignment
      "llm_vocab_growth",
      // round-9 wave 11: agg_bootstrap carries the 1-row point-estimate
      // (Σcents, n) scalar into the 1-row interval result
      "agg_bootstrap",
      // round-9 wave 17: agg_kendall's concordance census is a k<k'
      // self-join of the BOUNDED 25-nation aggregate (300 pairs after
      // one corpus hash agg — the deliberate O(n²)-on-bounded-grain
      // form; unbounded grains take merge-count or agg_spearman)
      "agg_kendall",
      // round-12: agg_theta_union's union row carries the 1-row exact
      // countDistinct audit scalar into the 1-row union-state frame —
      // the crossJoin(broadcast(agg)) scalar idiom
      "agg_theta_union",
      // round-13: agg_quantile_union mirrors theta — the union row
      // carries the 1-row global percentile_disc audit scalar
      "agg_quantile_union",
      // round-13: seq_nfa_pred broadcasts the 1-row p90 guard threshold
      // into the event stream before the user-key exchange (the
      // dq_freshness watermark pattern)
      "seq_nfa_pred",
      // round-14: llm_hybrid_rrf's two legs reuse two allowlisted
      // patterns — the BM25 leg carries the 1-row n_docs/avglen scalar
      // (llm_bm25_retrieve's cross) and the dense leg crosses the corpus
      // with the BOUNDED 8-query broadcast batch (the llm_knn_join
      // contract; IVF/LSH candidate join at 100 TB per scaladoc).
      // llm_retrieval_eval re-plans the same legs for its metric frames.
      "llm_hybrid_rrf", "llm_retrieval_eval",
      // round-14: dq_t_closeness crosses the QI-class frame with the
      // 5-row global segment distribution and its 1-row total — the
      // domain-bounded dense-spine pattern (llm_source_psi's class)
      "dq_t_closeness")
    val withNlj = plans.flatMap { case (name, plan) =>
      val n = plan.collect {
        case j: BroadcastNestedLoopJoinExec => j
        case j: CartesianProductExec        => j
      }.size
      if (n > 0) Some(name) else None
    }.toSet
    // two-sided: new offenders fail, and stale allowlist entries fail too,
    // so the list always names EXACTLY the intentional nested loops
    assert((withNlj -- allowed).isEmpty,
      s"unexpected nested-loop/cartesian joins: ${(withNlj -- allowed).toSeq.sorted.mkString(", ")} — " +
        "these do not scale; use an equi/range join or add an explicit, justified allowlist entry")
    assert((allowed -- withNlj).isEmpty,
      s"allowlist entries no longer plan a nested loop (remove them): ${(allowed -- withNlj).toSeq.sorted.mkString(", ")}")
  }
}
