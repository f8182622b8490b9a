package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 wave-6 semantics (Analytics2). The DuckDB oracle proves value
  * equality for all five queries; these tests pin the definitional
  * properties the hash compare cannot see — the cohort identity at age 0,
  * the skyline's dominance law replayed in Scala, the symmetry laws of
  * association rules, crossing-edge consistency, and the two attribution
  * models' conservation of the purchase set. */
class Analytics2Spec extends AnyFunSuite {
  import TestSpark._

  test("cohort_triangle: age-0 identity, monotone bounds, census") {
    val out = operators.Analytics2.cohortTriangle(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (age, active, users, ret) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(age >= 0 && active >= 1 && active <= users)
      if (age == 0) assert(active == users && ret == 1.0,
        "every cohort customer is active in the cohort month")
      assert(ret > 0 && ret <= 1.0)
    }
    // age-0 cohort sizes partition the customer base with ≥1 order
    val custs = Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(out.filter(_.getInt(1) == 0).map(_.getLong(3)).sum == custs)
  }

  test("skyline_2d: exactly the non-dominated parts (dominance replayed)") {
    val parts = Tables.part(spark, sf0001)
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominated(a: (Long, Int, Double)) = parts.exists { b =>
      b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)
    }
    val expect = parts.filterNot(dominated).map(_._1).toSet
    val got = operators.Analytics2.skyline2d(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got == expect, s"frontier mismatch: got $got expect $expect")
  }

  test("basket_rules: support symmetry, lift symmetry, probability bounds") {
    val out = operators.Analytics2.basketRules(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    byPair.foreach { case ((a, b), (nab, conf, lift)) =>
      assert(conf > 0 && conf <= 1.0)
      assert(lift > 0)
      // n(ab) = n(ba); lift is symmetric (confidence is not)
      byPair.get((b, a)).foreach { case (nba, _, liftBa) =>
        assert(nba == nab)
        assert(math.abs(lift - liftBa) <= 1e-6 + 1e-9)
      }
    }
  }

  test("ts_sma_crossover: flags are exclusive edges of the above sequence") {
    val out = operators.Analytics2.tsSmaCrossover(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val seq = rows.sortBy(_.getDate(1).toString)
      seq.foreach { r =>
        val (above, golden, death) = (r.getInt(4), r.getInt(5), r.getInt(6))
        assert(golden + death <= 1)
        if (golden == 1) assert(above == 1)
        if (death == 1) assert(above == 0)
      }
      // within the emitted window, a crossing flag requires a flip from
      // the previous emitted row's above state
      seq.sliding(2).foreach {
        case Array(p, c) =>
          if (c.getInt(5) == 1) assert(p.getInt(4) == 0, "golden needs below→above")
          if (c.getInt(6) == 1) assert(p.getInt(4) == 1, "death needs above→below")
          if (c.getInt(5) == 0 && c.getInt(6) == 0)
            assert(c.getInt(4) == p.getInt(4), "no flag ⇒ no flip")
        case _ =>
      }
    }
  }

  test("feat_target_encode: LOO identity (n−1)·loo + target = n·naive per row") {
    val out = operators.Analytics2.featTargetEncode(spark, sf0001).collect()
    assert(out.nonEmpty)
    val groups = out.groupBy(_.getString(1))
    groups.foreach { case (_, rows) =>
      val n = rows.length
      rows.foreach { r =>
        val (target, loo, naive) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
        // identity up to the two 6dp display rounds
        assert(math.abs((n - 1) * loo + target - n * naive) < 0.01 * n,
          s"LOO identity broken: n=$n target=$target loo=$loo naive=$naive")
      }
      // all rows in a group share the naive encoding
      assert(rows.map(_.getDouble(4)).distinct.length == 1)
    }
  }

  test("llm_rater_kappa: matrix census and the kappa definition replayed") {
    val r = operators.LlmOpsExtra.llmRaterKappa(spark, sf0001).head()
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == n11 + n10 + n01 + n00, "cells partition the corpus")
    assert(n == Tables.documents(spark, sf0001).count())
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble / n) * ((n11 + n01).toDouble / n) +
      ((n01 + n00).toDouble / n) * ((n10 + n00).toDouble / n)
    val kappa = (po - pe) / (1.0 - pe)
    assert(math.abs(r.getDouble(5) - po) < 1e-6)
    assert(math.abs(r.getDouble(6) - pe) < 1e-6)
    assert(math.abs(r.getDouble(7) - kappa) < 1e-6)
    assert(kappa <= 1.0 + 1e-9)
  }

  test("llm_split_leakage: classes partition the memoized pair stream") {
    val out = operators.LlmOpsPipeline.llmSplitLeakage(spark, sf0001).collect()
    assert(out.nonEmpty)
    val totalPairs = out.map(_.getLong(2)).sum
    // n_pairs over all classes = the full near-dup pair count
    // (the same memoized artifact the query reads)
    assert(totalPairs == operators.LlmOps.nearDupPairs(spark, sf0001).count())
    out.foreach { r =>
      val (s1, s2, nPairs, nDocs, cross) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(s1 <= s2, "classes are canonically ordered")
      assert(cross == (if (s1 != s2) 1 else 0))
      // a class with p pairs involves between ~sqrt(p) and 2p docs
      assert(nDocs >= 2 && nDocs <= 2 * nPairs)
    }
  }

  test("bill_price_index: base year anchors at 100; YoY lags the index") {
    val out = operators.Billing.billPriceIndex(spark, sf0001).collect()
    assert(out.length >= 5)
    val first = out.head
    assert(first.getDouble(3) == 100.0, "base year index = 100")
    assert(first.isNullAt(4), "first year has no YoY")
    // index tracks unit value: idx_t ≈ 100 · uv_t / uv_0
    val uv0 = first.getDouble(2)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - 100.0 * r.getDouble(2) / uv0) < 0.05,
        "index consistent with unit values")
    }
  }

  test("interval_concurrency: peak bounded by window count, replayed for one supplier") {
    val out = operators.Analytics2.intervalConcurrency(spark, sf0001).collect()
    assert(out.nonEmpty)
    val counts = Tables.lineitem(spark, sf0001)
      .groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= counts(r.getLong(0)),
        "1 <= peak <= n_windows")
    }
    // replay the sweep in Scala for the first supplier
    val sk = out.head.getLong(0)
    val ivs = Tables.lineitem(spark, sf0001)
      .filter(col("l_suppkey") === sk)
      .select(datediff(date_trunc("day", col("l_shipdate")),
        lit("1970-01-01").cast("date")).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(0) + r.getLong(1)))
    val days = ivs.flatMap(i => Seq(i._1, i._2)).distinct.sorted
    val peak = days.map(d => ivs.count(i => i._1 <= d && d < i._2)).max
    assert(out.head.getLong(1) == peak, s"sweep replay for supplier $sk")
  }

  test("cust_migration: matrix census covers every customer exactly once") {
    val out = operators.Analytics2.custMigration(spark, sf0001).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(2)).sum
    val custs = Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")) <= 1997 || year(col("o_orderdate")) >= 1999)
      .select("o_custkey").distinct().count()
    assert(total == custs, "every in-scope customer lands in exactly one cell")
    assert(!out.exists(r => r.getString(0) == "none" && r.getString(1) == "none"),
      "the (none, none) cell cannot exist")
  }

  test("llm_vocab_growth: running sums consistent, vocab census exact") {
    val out = operators.LlmOpsPipeline.llmVocabGrowth(spark, sf0001).collect()
    assert(out.length == 10)
    var (ct, ctok) = (0L, 0L)
    out.sortBy(_.getInt(0)).foreach { r =>
      ct += r.getLong(1); ctok += r.getLong(3)
      assert(r.getLong(2) == ct, "cum_types is the running sum")
      assert(r.getLong(4) == ctok, "cum_tokens is the running sum")
    }
    val vocab = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct("t")).head().getLong(0)
    assert(ct == vocab, "total new types = corpus vocabulary")
  }

  test("ts_peaks: exactly the strict ±3 local maxima above the mean (replayed)") {
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    // .toSeq before flatMap: flatMap over a Map of (type, day) tuples
    // would rebuild a MAP keyed by type and keep only each type's last peak
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val s = rows.sortBy(_._2.getTime)
      val total = s.map(_._3).sum
      s.indices.collect {
        case i if i >= 3 && i < s.length - 3 &&
          (i - 3 to i + 3).forall(j => j == i || s(j)._3 < s(i)._3) &&
          s(i)._3 * s.length > total =>
          (t, s(i)._2.toLocalDateTime.toLocalDate.toString)
      }
    }.toSet
    val got = operators.TimeSeries.tsPeaks(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(got == expect, s"peak set mismatch: got $got expect $expect")
    operators.TimeSeries.tsPeaks(spark, sf0001).collect()
      .foreach(r => assert(r.getDouble(3) > 0, "prominence is strictly positive"))
  }

  test("ops_fulfillment: census, monotone service levels, bounds") {
    val out = operators.Analytics2.opsFulfillment(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).sum ==
      Tables.orders(spark, sf0001).join(Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"), "left_semi").count(),
      "every order with lineitems lands in exactly one priority row")
    out.foreach { r =>
      val (p30, p60, p90) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p30 <= p60 && p60 <= p90 && p90 <= 1.0, "service levels are monotone")
      assert(r.getDouble(2) <= r.getLong(6), "avg lag bounded by max lag")
    }
  }

  test("dq_recon: buckets partition the order ledger; gap identity holds") {
    val out = operators.DataQuality.dqRecon(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).sum == Tables.orders(spark, sf0001).count(),
      "every order lands in exactly one bucket")
    out.foreach { r =>
      assert(math.abs((r.getDouble(2) - r.getDouble(3)) - r.getDouble(4)) < 1e-6,
        "net gap = header − line per bucket")
      assert(math.abs(r.getDouble(4)) <= r.getDouble(5) + 1e-9,
        "|net| ≤ abs gap")
      if (r.getString(0) == "missing_lines")
        assert(r.getDouble(3) == 0.0, "line total of line-less orders is 0")
    }
  }

  test("surv_km: the K-M estimator replayed; survival non-increasing") {
    val out = operators.Analytics2.survKm(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(out.nonEmpty)
    // replay from the raw events
    val dayN = datediff(date_trunc("day", col("ts")), lit("1970-01-01").cast("date"))
    val per = Tables.events(spark, sf0001).groupBy("user_id")
      .agg(min(dayN).cast("long").as("s"),
        min(when(col("event_type") === "purchase", dayN)).cast("long").as("p"))
      .collect().map { r =>
        val s = r.getLong(1)
        val traw = if (r.isNullAt(2)) None else Some(r.getLong(2) - s)
        val dead = traw.exists(_ <= 3)
        (if (dead) traw.get else 3L, dead)
      }
    val n = per.length
    var atRisk = n.toLong
    var surv = 1.0
    val exp = (0L to 3L).flatMap { t =>
      val d = per.count(u => u._2 && u._1 == t).toLong
      val c = per.count(u => !u._2 && u._1 == t).toLong
      val row = if (d > 0) {
        surv *= (1.0 - d.toDouble / atRisk)
        Some((t, atRisk, d, surv))
      } else None
      atRisk -= (d + c)
      row
    }
    assert(out.length == exp.length)
    out.zip(exp).foreach { case (r, (t, nr, d, s)) =>
      assert(r.getLong(0) == t && r.getLong(1) == nr && r.getLong(2) == d)
      assert(math.abs(r.getDouble(3) - s) < 1e-5, s"S($t): ${r.getDouble(3)} vs $s")
    }
    out.sliding(2).foreach {
      case Array(a, b) => assert(b.getDouble(3) <= a.getDouble(3) + 1e-12)
      case _ =>
    }
  }

  test("agg_bootstrap: point estimate exact, interval brackets it") {
    val r = operators.Analytics2.aggBootstrap(spark, sf0001).head()
    assert(r.getLong(0) == 32, "32 replicas")
    val (point, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val direct = Tables.orders(spark, sf0001)
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("c"),
        count(lit(1)).as("n")).head()
    assert(math.abs(point -
      direct.getLong(0).toDouble / direct.getLong(1) / 100.0) < 1e-4,
      "point mean is the exact unweighted mean")
    assert(lo < hi, "non-degenerate interval")
    assert(lo <= point && point <= hi, "interval brackets the point estimate")
  }

  test("graph_hits: the two power-method steps replayed exactly") {
    val edges = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a1 = edges.groupBy(_._1).map { case (p, es) => p -> es.length.toLong }
    val h1 = edges.groupBy(_._2).map { case (s, es) =>
      s -> es.map(e => a1(e._1)).sum }
    val a2 = edges.groupBy(_._1).map { case (p, es) =>
      p -> es.map(e => h1(e._2)).sum }
    def top10(m: Map[Long, Long]) =
      m.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    val out = operators.Clustering.graphHits(spark, sf0001).collect()
    val gotA = out.filter(_.getString(0) == "authority")
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    val gotH = out.filter(_.getString(0) == "hub")
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(gotA.sortBy { case (k, v) => (-v, k) } == top10(a2),
      "authority top-10 with exact integer scores")
    assert(gotH.sortBy { case (k, v) => (-v, k) } == top10(h1),
      "hub top-10 with exact integer scores")
  }

  test("agg_spearman: rho bounded, rank-sum identity holds per segment") {
    val rows = operators.Aggregates.aggSpearman(spark, sf0001).collect()
    assert(rows.length == 5, "one row per market segment")
    rows.foreach { r =>
      val (n, rho) = (r.getLong(1), r.getDouble(2))
      assert(n > 1, s"segment ${r.getString(0)} has enough customers")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, "rho in [-1, 1]")
      // count and spend are strongly positively associated by construction
      assert(rho > 0.5, s"order count vs spend is strongly monotone (got $rho)")
    }
    // self-correlation sanity: ranking y against y must give exactly 1
    val self = {
      import org.apache.spark.sql.functions._
      val cust = Tables.orders(spark, sf0001)
        .groupBy("o_custkey")
        .agg(round(round(sum("o_totalprice"), 2) * 100, 0).cast("long").as("y"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("y").asc)
      val wt = org.apache.spark.sql.expressions.Window.partitionBy("y")
      val ranked = cust.select(
        (rank().over(w).cast("long") * 2 + count(lit(1)).over(wt) - 1).as("r"))
      val s = ranked.agg(count(lit(1)).as("n"), sum("r").as("s1"),
        sum(col("r") * col("r")).as("s2")).head()
      val (n, s1, s2) = (s.getLong(0), s.getLong(1), s.getLong(2))
      // Σ(2·avgrank) = n(n+1) exactly — the tie-averaging invariant
      assert(s1 == n * (n + 1), "doubled average ranks sum to n(n+1)")
      (n * s2 - s1 * s1).toDouble / (n * s2 - s1 * s1)
    }
    assert(self == 1.0, "rho(y, y) = 1 exactly")
  }

  test("agg_kendall: pair census is complete and tau_b bounded") {
    val r = operators.Aggregates.aggKendall(spark, sf0001).head()
    val (n0, conc, disc, tx, ty) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val k = Tables.customer(spark, sf0001)
      .select("c_nationkey").distinct().count()
    assert(n0 == k * (k - 1) / 2, "all unordered nation pairs counted once")
    assert(conc + disc <= n0, "concordant + discordant never exceed pairs")
    assert(n0 - tx > 0 && n0 - ty > 0, "tie correction keeps denominator positive")
    val tau = r.getDouble(5)
    assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9, "tau_b in [-1, 1]")
    // tau and the concordance margin must carry the same sign
    assert((conc - disc) == 0 || math.signum(tau) == math.signum((conc - disc).toDouble))
  }

  test("agg_cramers_v: effect sizes bounded and consistent with chi2") {
    val r = operators.Aggregates.aggCramersV(spark, sf0001).head()
    val (n, nr, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == Tables.orders(spark, sf0001).count())
    assert(nr >= 2 && nc >= 2, "contingency table is non-degenerate")
    val (chi2, phi2, v, cc) =
      (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0 + 1e-9, "Cramér's V in [0, 1]")
    assert(cc >= 0.0 && cc < 1.0, "contingency coefficient in [0, 1)")
    assert(math.abs(phi2 - chi2 / n) < 1e-4, "phi2 = chi2/n")
    // V² = phi2 / min(r-1, c-1) up to the published rounding
    val minDim = math.min(nr - 1, nc - 1).toDouble
    assert(math.abs(v * v - chi2 / (n * minDim)) < 1e-4)
    // consistency with agg_chisq: its per-cell terms sum to this chi2
    val cellSum = operators.Aggregates.aggChisq(spark, sf0001)
      .collect().map(_.getDouble(4)).sum
    assert(math.abs(cellSum - chi2) < 0.01,
      "1-row panel agrees with the per-cell decomposition")
  }

  test("agg_mutual_info: information-theoretic bounds hold") {
    val r = operators.Aggregates.aggMutualInfo(spark, sf0001).head()
    val (n, cells) = (r.getLong(0), r.getLong(1))
    assert(n == Tables.customer(spark, sf0001).count())
    assert(cells >= 2)
    val (mi, hx, hy, nmi) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(mi >= -1e-9, "MI is non-negative (Gibbs)")
    assert(hx > 0 && hy > 0, "marginals are non-degenerate")
    assert(mi <= math.min(hx, hy) + 1e-9, "MI bounded by min marginal entropy")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9, "NMI in [0, 1]")
  }

  test("ops_abc_xyz: Pareto cuts and tercile census hold") {
    val out = operators.Analytics2.opsAbcXyz(spark, sf0001).collect()
    assert(out.length == 25, "all 25 brands classified")
    // A-class revenue is at most 80% of total plus the straddling brand
    val byRev = out.sortBy(r => (-r.getDouble(3), r.getString(0)))
    val tot = out.map(_.getDouble(3)).sum
    var cum = 0.0
    byRev.foreach { r =>
      cum += r.getDouble(3)
      val cls = r.getString(1)
      if (cum <= 0.80 * tot + 1e-6) assert(cls == "A", s"${r.getString(0)} in A")
      else if (cum > 0.95 * tot + 1e-6) assert(cls == "C", s"${r.getString(0)} in C")
    }
    // terciles split 25 brands 9/8/8
    val xyz = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(xyz == Map("X" -> 9, "Y" -> 8, "Z" -> 8), s"tercile census: $xyz")
    out.foreach(r => assert(r.getDouble(4) >= 0 && r.getDouble(4) < 1, "qcd in [0,1)"))
  }

  test("feat_woe_iv: shares sum to one per class; IV non-negative and shared") {
    val out = operators.Analytics2.featWoeIv(spark, sf0001).collect()
    assert(out.length == 10)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4, "good shares sum to 1")
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-4, "bad shares sum to 1")
    val iv = out.head.getDouble(6)
    out.foreach(r => assert(r.getDouble(6) == iv, "IV total identical on every row"))
    assert(iv >= -1e-9, "IV is a sum of (p−q)(ln p − ln q) terms — non-negative")
    // replay one bin's WoE
    val r0 = out.head
    val (tg, tb) = (out.map(_.getLong(1)).sum, out.map(_.getLong(2)).sum)
    val expect = math.log((r0.getLong(1).toDouble / tg) / (r0.getLong(2).toDouble / tb))
    assert(math.abs(r0.getDouble(5) - expect) < 1e-5)
  }

  test("llm_mix_temperature: flattening law — q between p and uniform") {
    val out = operators.LlmOpsPipeline.llmMixTemperature(spark, sf0001).collect()
    assert(out.nonEmpty)
    val n = out.length
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-4,
      "sampled shares sum to 1")
    out.foreach { r =>
      val (p, q, boost) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // α<1 flattens: q sits between the raw share and uniform 1/n
      val lo = math.min(p, 1.0 / n) - 1e-4
      val hi = math.max(p, 1.0 / n) + 1e-4
      assert(q >= lo && q <= hi, s"q=$q outside [$lo, $hi] for p=$p")
      assert(if (p < 1.0 / n) boost >= 1.0 - 1e-4 else boost <= 1.0 + 1e-4,
        "tail sources boosted, head sources damped")
    }
  }

  test("llm_ngram_prune: monotone in the threshold, t=1 keeps everything") {
    val out = operators.LlmOpsPipeline.llmNgramPrune(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val t1 = out.head
    assert(t1.getLong(2) == t1.getLong(1) && t1.getLong(4) == t1.getLong(3),
      "threshold 1 keeps every type and all mass")
    assert(t1.getDouble(5) == 1.0)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) <= a.getLong(2), "kept types non-increasing")
        assert(b.getLong(4) <= a.getLong(4), "kept mass non-increasing")
      case _ =>
    }
    // mass retains more than types at every cutoff > 1 (the pruning point)
    out.tail.foreach { r =>
      val typeShare = r.getLong(2).toDouble / r.getLong(1)
      assert(r.getDouble(5) >= typeShare - 1e-9,
        "retained mass share ≥ retained type share (high-count survivors)")
    }
  }

  test("ts_hurst: all four scales used; k=1 variance replayed; H plausible") {
    val out = operators.TimeSeries.tsHurst(spark, sf0001).collect()
    assert(out.nonEmpty)
    val dailies = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .collect().groupBy(_.getString(0))
    out.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == 4, "30-day series admits all four scales")
      val h = r.getDouble(2)
      assert(h > -0.5 && h < 1.5, s"H=$h wildly implausible for $t")
      // replay the k=1 (daily) log-variance
      val xs = dailies(t).map(_.getLong(2).toDouble)
      val mean = xs.sum / xs.length
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(math.abs(r.getDouble(3) - math.log(v)) < 1e-3,
        s"ln Var(k=1) replay for $t")
    }
  }

  test("llm_dedup_agreement: confusion census consistent with the two pair streams") {
    val r = operators.LlmOpsPipeline.llmDedupAgreement(spark, sf0001).head()
    val (fp, jac, both, fpOnly, jacOnly) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(both <= math.min(fp, jac))
    assert(fpOnly == fp - both && jacOnly == jac - both)
    // jaccard pair count matches the memoized stream this query reads
    assert(jac == operators.LlmOps.nearDupPairs(spark, sf0001).count())
    assert(math.abs(r.getDouble(5) - both.toDouble / fp) < 1e-6, "precision")
    assert(math.abs(r.getDouble(6) - both.toDouble / jac) < 1e-6, "recall")
  }

  test("attr_touch: both models attribute the identical purchase set") {
    val out = operators.Analytics2.attrTouch(spark, sf0001).collect()
    val first = out.filter(_.getString(0) == "first")
    val last = out.filter(_.getString(0) == "last")
    assert(first.nonEmpty && last.nonEmpty)
    // same purchases, same total revenue — attribution reshuffles credit,
    // never creates or destroys it
    assert(first.map(_.getLong(2)).sum == last.map(_.getLong(2)).sum)
    assert(math.abs(first.map(_.getDouble(3)).sum -
      last.map(_.getDouble(3)).sum) < 1e-6)
    // a purchase has a first touch iff it has a last touch, so the
    // '(none)' bucket is identical under both models
    val noneF = first.find(_.getString(1) == "(none)").map(_.getLong(2)).getOrElse(0L)
    val noneL = last.find(_.getString(1) == "(none)").map(_.getLong(2)).getOrElse(0L)
    assert(noneF == noneL)
  }
}
