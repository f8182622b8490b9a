package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 addenda semantics. The DuckDB oracle proves value equality for
  * all twelve new queries; these tests pin the properties the oracle
  * cannot see — internal identities (HHI bounds, RSI range, recognition
  * conserving billed revenue), cross-query consistency, and the replayed
  * definitions of the window statistics. */
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
    val expect = (14 until diffs.length + 1).flatMap { i =>
      if (i < 14) None
      else {
        val frame = diffs.slice(i - 14, i)
        val ag = r4(frame.filter(_ > 0).sum / 14)
        val al = r4(-frame.filter(_ < 0).sum / 14)
        Some(r4(if (al == 0) 100.0 else 100.0 - 100.0 / (1 + ag / al)))
      }
    }
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
