package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 addenda semantics. The DuckDB oracle proves value equality
  * for all 28 oracle-backed queries this round adds; these tests pin the
  * properties the oracle cannot see — internal identities (HHI bounds,
  * RSI range, recognition conserving billed revenue, funnel census,
  * Theil bounds), cross-query consistency, and the replayed definitions
  * of the window statistics. */
class Round9OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("tpch_q6/q13/q15/q17/q18: non-degenerate results with the declared shapes") {
    val q6 = operators.Workload.tpchQ6(spark, sf0001).collect()
    assert(q6.length == 1 && q6.head.getDouble(0) > 0)
    val q13 = operators.Workload.tpchQ13(spark, sf0001).collect()
    // every customer appears in exactly one bucket of the distribution
    assert(q13.map(_.getLong(1)).sum ==
      Tables.customer(spark, sf0001).count())
    val q15 = operators.Workload.tpchQ15(spark, sf0001).collect()
    assert(q15.nonEmpty, "a quarter with revenue must crown a supplier")
    val best = q15.head.getDouble(2)
    q15.foreach(r => assert(r.getDouble(2) == best, "all rows tie the max"))
    val q17 = operators.Workload.tpchQ17(spark, sf0001).collect()
    assert(q17.length == 1 && q17.head.getDouble(0) >= 0)
    val q18 = operators.Workload.tpchQ18(spark, sf0001).collect()
    assert(q18.nonEmpty && q18.length <= 20)
    q18.foreach(r => assert(r.getDouble(5) > 250.0, "HAVING bound"))
  }

  test("bill_revrec: recognition conserves billed revenue and spreads 3 months") {
    val out = operators.Billing.billRevrec(spark, sf0001).collect()
    val billed = Tables.orders(spark, sf0001)
      .agg(sum("o_totalprice")).head().getDouble(0)
    val recognized = out.map(_.getDouble(2)).sum
    // Σ recognized = Σ billed up to the per-month 2dp rounds
    assert(math.abs(recognized - billed) < 0.01 * out.length,
      s"recognized $recognized vs billed $billed")
    // tranche census: every order contributes exactly 3 active-month rows
    val n = Tables.orders(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum == 3 * n)
  }

  test("llm_source_hhi: bounds and the uniform-fixture near-minimum") {
    val r = operators.LlmOpsPipeline.llmSourceHhi(spark, sf0001).head()
    val (ns, docHhi, tokHhi) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    // HHI ranges over [10000/n, 10000]
    assert(docHhi >= 10000.0 / ns - 1e-6 && docHhi <= 10000.0 + 1e-6)
    assert(tokHhi >= 10000.0 / ns - 1e-6 && tokHhi <= 10000.0 + 1e-6)
    // fixture sources are near-uniform: both axes sit close to the floor
    assert(docHhi < 3 * 10000.0 / ns && tokHhi < 3 * 10000.0 / ns)
    assert(r.getDouble(3) <= 1.0 && r.getDouble(4) <= 1.0)
  }

  test("llm_ttr: per-source identities vs a direct recount") {
    val out = operators.LlmOps.llmTtr(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (toks, types, ttr, hapax) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(types <= toks && types > 0)
      assert(math.abs(ttr - types.toDouble / toks) < 1e-6)
      assert(hapax >= 0 && hapax <= 1)
    }
    // census: token totals re-add to the corpus token count
    val corpusToks = Tables.documents(spark, sf0001)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(out.map(_.getLong(1)).sum == corpusToks)
  }

  test("llm_knn_classify: query census, accuracy bounds, vote arithmetic") {
    val out = operators.LlmOps.llmKnnClassify(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nQueries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 25 === 0).count()
    assert(out.map(_.getLong(1)).sum == nQueries, "every query predicted once")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0 && acc <= 1)
      assert(math.abs(acc - BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("ts_rsi: range [0,100] and a sequential replay of one type's series") {
    val out = operators.TimeSeries.tsRsi(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 100))
    // replay the SMA-RSI by hand for one type
    val tpe = out.head.getString(0)
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
      .filter(col("event_type") === tpe)
      .collect().sortBy(_.getTimestamp(1).getTime).map(_.getDouble(2))
    val diffs = daily.sliding(2).map(p => p(1) - p(0)).toArray
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = diffs.sliding(14).map { frame =>
      val ag = r4(frame.filter(_ > 0).sum / 14)
      val al = r4(-frame.filter(_ < 0).sum / 14)
      r4(if (al == 0) 100.0 else 100.0 - 100.0 / (1 + ag / al))
    }.toSeq
    val got = out.filter(_.getString(0) == tpe)
      .sortBy(_.getTimestamp(1).getTime).map(_.getDouble(2)).toSeq
    assert(got == expect, s"$tpe RSI replay mismatch")
  }

  test("ts_donchian: census and breakout counts bounded by days") {
    val out = operators.TimeSeries.tsDonchian(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (days, highs, lows) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(days > 0 && highs <= days && lows <= days)
      assert(r.getDouble(4) <= r.getDouble(5) + 1e-9, "avg range <= max range")
      assert(r.getDouble(4) >= 0)
    }
  }

  test("tpch_q4/q9/q19/q22: adapted shapes stay non-degenerate and consistent") {
    val q4 = operators.Workload.tpchQ4(spark, sf0001).collect()
    assert(q4.nonEmpty)
    // EXISTS can only shrink the base set
    val base = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q4.foreach(r => assert(r.getLong(1) <= base(r.getString(0))))
    val q9 = operators.Workload.tpchQ9(spark, sf0001).collect()
    assert(q9.nonEmpty && q9.forall(_.getDouble(2) > 0))
    val q19 = operators.Workload.tpchQ19(spark, sf0001).collect()
    assert(q19.length == 1 && q19.head.getDouble(0) > 0)
    val q22 = operators.Workload.tpchQ22(spark, sf0001).collect()
    assert(q22.nonEmpty)
    val q21 = operators.Workload.tpchQ21(spark, sf0001).collect()
    assert(q21.nonEmpty && q21.length <= 10)
    // counts ordered desc with name tiebreak
    q21.sliding(2).foreach(p => assert(p(0).getLong(1) >= p(1).getLong(1)))
    // anti-join semantics: no counted customer may have a recent order
    val recent = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= "2000-01-01")
      .select("o_custkey").distinct().count()
    val total = Tables.customer(spark, sf0001).count()
    assert(q22.map(_.getLong(1)).sum <= total - recent)
  }

  test("dq_dup_keys: PK audits clean, lineitem composite duplication surfaced") {
    val out = operators.DataQuality.dqDupKeys(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 5)
    Seq("customer.c_custkey", "orders.o_orderkey", "part.p_partkey",
      "supplier.s_suppkey").foreach { k =>
      assert(out(k).getLong(3) == 0, s"$k should be unique")
    }
    // the fixture's lineitem composite is genuinely duplicated — the
    // audit must SURFACE it, not smooth it over
    val li = out("lineitem.(l_orderkey,l_linenumber)")
    assert(li.getLong(3) > 0 && li.getDouble(4) > 0)
    assert(li.getLong(2) + li.getLong(3) == li.getLong(1))
  }

  test("agg_winsorized: clipping moves the mean toward the interior, n preserved") {
    val out = operators.Aggregates.aggWinsorized(spark, sf0001).collect()
    assert(out.nonEmpty)
    val custPerNation = Tables.customer(spark, sf0001)
      .groupBy("c_nationkey").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    out.foreach { r =>
      val (n, clipped) = (r.getLong(1), r.getLong(4))
      assert(clipped <= n, "cannot clip more rows than exist")
      assert(n == custPerNation(r.getInt(0).toLong), "winsorizing keeps n")
    }
  }

  test("agg_pareto: monotone curve, endpoints pinned") {
    // n_cust is LongType since round 10 (the two-level rank carries
    // ranks as int64 — the scale-correct width, matching the oracle's
    // BIGINT)
    val out = operators.Aggregates.aggPareto(spark, sf0001).collect()
      .sortBy(_.getInt(0))
    assert(out.length == 8)
    // more revenue share requires at least as many customers
    out.sliding(2).foreach { p =>
      assert(p(0).getLong(1) <= p(1).getLong(1))
      assert(p(0).getDouble(3) <= p(1).getDouble(3) + 1e-9)
    }
    val last = out.last
    assert(last.getInt(0) == 100 &&
      last.getLong(1) == Tables.customer(spark, sf0001).count() &&
      math.abs(last.getDouble(3) - 1.0) < 1e-9,
      "the 100% row must need every customer and reach share 1")
    // definitional bound: the reached share meets its threshold
    out.foreach(r => assert(r.getDouble(3) >= r.getInt(0) / 100.0 - 1e-9))
  }

  test("seq_markov: rows are probability distributions over observed transitions") {
    val out = operators.Analytics.seqMarkov(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byFrom = out.groupBy(_.getString(0))
    byFrom.foreach { case (from, rows) =>
      val pSum = rows.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from rows sum to $pSum")
    }
    // census: total transitions = events - one terminal event per user
    val nEvents = Tables.events(spark, sf0001).count()
    val nUsers = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("ts_perm_entropy: normalized range and the pattern census") {
    val out = operators.TimeSeries.tsPermEntropy(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 6, "at most 3! patterns")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1.0 + 1e-9,
        "ln(6)-normalized entropy is in [0,1]")
    }
  }

  test("bill_dso: identity replay and open-ar bound") {
    val out = operators.Billing.billDso(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (billed, openAr, dso) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(openAr <= billed + 1e-9, "open A/R cannot exceed billed")
      assert(dso >= 0 && dso <= 31.0 + 1e-9,
        "DSO under this definition is bounded by the month length")
    }
  }

  test("llm_char_ngrams: top-5 per lang, counts consistent with a recount") {
    val out = operators.LlmOps.llmCharNgrams(spark, sf0001).collect()
    val langs = out.map(_.getString(0)).distinct
    langs.foreach { l =>
      val rows = out.filter(_.getString(0) == l).sortBy(_.getInt(1))
      assert(rows.length == 5)
      // ranks are 1..5 and counts non-increasing
      assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4, 5))
      rows.sliding(2).foreach(p => assert(p(0).getLong(3) >= p(1).getLong(3)))
      rows.foreach(r => assert(r.getString(2).length == 3))
    }
    // spot-recount the top trigram of one language by brute force
    val l0 = langs.min
    val top = out.filter(r => r.getString(0) == l0 && r.getInt(1) == 1).head
    val docs = Tables.documents(spark, sf0001)
      .filter(col("lang") === l0).select("text").collect().map(_.getString(0))
    val cnt = docs.map(t => t.sliding(3).count(_ == top.getString(2))).sum
    assert(cnt == top.getLong(3), s"recount of '${top.getString(2)}'")
  }

  test("agg_theil: non-negative, zero iff uniform, gini-consistent ordering") {
    val out = operators.Aggregates.aggTheil(spark, sf0001).collect()
    assert(out.nonEmpty)
    // Theil T >= 0 with equality only for perfectly equal incomes
    out.foreach(r => assert(r.getDouble(2) >= -1e-9))
    // and is bounded above by ln(n) (all revenue on one customer)
    out.foreach(r => assert(r.getDouble(2) <= math.log(r.getLong(1).toDouble) + 1e-9))
  }

  test("rfm_segments: quintiles balanced, census bounded, profiles ordered") {
    val out = operators.Analytics.rfmSegments(spark, sf0001).collect()
    assert(out.nonEmpty)
    val total = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    // HAVING >= 5 can only drop customers
    assert(out.map(_.getLong(3)).sum <= total)
    out.foreach { r =>
      Seq(0, 1, 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 5))
      assert(r.getLong(4) <= r.getLong(5), "min_rec <= max_rec")
      assert(r.getDouble(6) >= 1.0, "every counted customer ordered")
    }
    // recency quintile 1 holds the most recent buyers: its max recency
    // must not exceed quintile 5's min recency
    val r1max = out.filter(_.getInt(0) == 1).map(_.getLong(5))
    val r5min = out.filter(_.getInt(0) == 5).map(_.getLong(4))
    if (r1max.nonEmpty && r5min.nonEmpty) assert(r1max.max <= r5min.min)
  }

  test("llm_dedup_funnel: stage identities and cross-query consistency") {
    val r = operators.LlmOpsPipeline.llmDedupFunnel(spark, sf0001).head()
    val (n, s1, s2, s3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // each stage only shrinks
    assert(n >= s1 && s1 >= s2 && s2 >= s3 && s3 > 0)
    // removals re-add to the census
    assert(r.getLong(4) == n - s1 && r.getLong(5) == s1 - s2 &&
      r.getLong(6) == s2 - s3)
    assert(math.abs(r.getDouble(7) - (1.0 - s3.toDouble / n)) < 1e-6)
    // stage-1 census agrees with the declared exact-dedup query
    val exactKept = operators.LlmOps.llmDedupExact(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    assert(s1 == exactKept)
  }

  test("llm_emb_drift: 64 dims per label, cosine in [-1,1], dist >= 0") {
    val out = operators.LlmOps.llmEmbDrift(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 64, "every dimension pairs across batches")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      assert(r.getDouble(3) >= 0)
    }
  }

  test("llm_mm_dedup: census identities and the re-ingest batch arithmetic") {
    val out = operators.Multimodal.llmMmDedup(spark, sf0001).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rein = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 7 === 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(1) == docs(lang) + rein.getOrElse(lang, 0L),
        "items = base + re-ingested")
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3),
        "dup_items = items - unique payloads")
      assert(r.getLong(5) <= r.getLong(4), "savings bounded by total bytes")
      // every re-ingested payload duplicates its base copy
      assert(r.getLong(3) >= rein.getOrElse(lang, 0L))
    }
  }

  test("dq_orphans: all 7 star-schema edges audited, fixture is orphan-free") {
    val out = operators.DataQuality.dqOrphans(spark, sf0001).collect()
    assert(out.length == 7)
    val li = Tables.lineitem(spark, sf0001).count()
    out.foreach { r =>
      assert(r.getLong(2) == 0, s"${r.getString(0)} has orphans")
      assert(r.getDouble(3) == 0.0)
      if (r.getString(0).startsWith("lineitem.")) assert(r.getLong(1) == li)
    }
  }
}
