package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Round-2 additions: OHLC resample, mode, embedding quantization,
  * hyperplane-LSH ANN. */
class Round2OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("ts_resample: bar invariants hold and counts cover every event") {
    val bars = TimeSeries.tsResample(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(bars.map(_.getLong(2)).sum === total, "bars must cover all events")
    bars.foreach { r =>
      val (open, close, low, high) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(low <= high)
      assert(open >= low - 0.005 && open <= high + 0.005) // low/high rounded to 2
      assert(close >= low - 0.005 && close <= high + 0.005)
    }
  }

  test("agg_mode: one row per customer, mode count is the max count") {
    val out = Aggregates.aggMode(spark, sf0001)
    val perCust = out.groupBy("o_custkey").count().filter(col("count") > 1).count()
    assert(perCust === 0, "exactly one mode row per customer")
    // the reported count must equal the customer's max priority count
    val maxc = Tables.orders(spark, sf0001)
      .groupBy("o_custkey", "o_orderpriority").agg(count(lit(1)).as("c"))
      .groupBy("o_custkey").agg(max("c").as("mx"))
    val bad = out.join(maxc, "o_custkey").filter(col("cnt") =!= col("mx")).count()
    assert(bad === 0)
  }

  test("quantize: int8 reconstruction error is positive and bounded by the scale") {
    val rows = LlmOpsExtra.llmQuantize(spark, sf0001).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sf0001).count())
    rows.foreach { r =>
      val avg = r.getDouble(2); val mx = r.getDouble(3)
      assert(avg > 0.0 && avg <= mx)
      // per-dim error <= sc/2 = (max-min)/512; embeddings are in ~[-4,4],
      // so err <= sqrt(64) * 8/512 = 0.125 — generous bound 0.5
      assert(mx < 0.5, s"max_err=$mx")
    }
  }

  test("scan_pruned: the executed plan prunes to the one month partition") {
    val df = SourcesSinks.scanPruned(spark, sf0001)
    df.collect() // materialize (triggers the staged write + pruned read)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("month") && plan.contains("1996-03"),
      s"expected month partition filter in scan:\n${plan.take(2000)}")
  }

  test("round-2 expressions are callable from SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT simhash64(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS s,
        |  jaccard_long_sim(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
        |                   array(CAST(2 AS BIGINT), CAST(3 AS BIGINT))) AS j""".stripMargin)
      .head()
    assert(r.getDouble(1) === 1.0 / 3.0)
    // simhash of {1,2}: votes from bits of 1 and 2 -> bits 0 and 1 tie at 0,
    // all higher bits -2 -> signature 0
    assert(r.getLong(0) === 0L)
  }

  test("SortedJaccardRewrite upgrades naive SQL jaccard_sim to the merge kernel") {
    // parquet-backed input (a LocalRelation would be constant-folded away
    // before the expression could be inspected)
    val docs = Tables.documents(spark, sf0001)
    docs.createOrReplaceTempView("docs_sjr")
    val df = spark.sql(
      """SELECT doc_id, jaccard_sim(
        |  sort_array(array_distinct(split(text, ' '))),
        |  sort_array(array_distinct(split(reverse(text), ' ')))) AS j
        |FROM docs_sjr""".stripMargin)
    val kernels = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case k: graft.functions.JaccardSim => k })
    assert(kernels.nonEmpty, "jaccard_sim must survive into the optimized plan")
    assert(kernels.forall(k => k.assumeSorted && k.assumeDistinct),
      "rewrite must fire on the sorted-distinct pattern")
    // and the upgraded kernel computes the same values as the general one
    val naive = docs.select(
      graft.functions.sim.jaccardSim(
        sort_array(array_distinct(split(col("text"), " "))),
        sort_array(array_distinct(split(reverse(col("text")), " ")))).as("j"))
      .collect().map(_.getDouble(0))
    val rewritten = df.select("j").collect().map(_.getDouble(0))
    assert(naive.toSeq === rewritten.toSeq)
  }

  test("join_fuzzy: identical names are distance 0 and every avg_dist <= 3") {
    val rows = JoinsAdvanced.joinFuzzy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 3.0))
  }

  test("agg_bool: every/any consistent with the filtered counts") {
    val rows = Aggregates.aggBool(spark, sf0001).collect()
    rows.foreach { r =>
      val hi = r.getLong(1); val n = r.getLong(5)
      assert(hi <= n)
      assert(r.getBoolean(2), "all quantities in the fixture are positive")
    }
  }

  test("ann_lsh: ranks dense from 1, sims descend, self excluded, bucket-pure") {
    val out = LlmOpsExtra.llmAnnLsh(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) != r.getLong(0)), "self excluded")
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.size))
      val sims = sorted.map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(rows.map(_.getInt(3)).distinct.size === 1, "all neighbors share the query's bucket")
    }
  }
}
