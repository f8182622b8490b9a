package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Hand-built mini-DataFrame semantics checks per SURVEY §2 category —
  * the cases the fixtures can't exercise (NULL paths, tie-breaks,
  * rounding boundaries) plus sf0.001 sanity for each family. */
class OperatorSemanticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- §2.B/§2.Z: money rounding boundary --------------------------------
  test("money() resolves .xx5 boundaries via exact decimal (HALF_UP)") {
    val df = Seq(1222.745, 1.005, 2.675, -1.115).toDF("x")
      .select(Relational.money(col("x")).as("m"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1222.75, 1.01, 2.68, -1.12))
  }

  test("filter_nullsafe keeps manufactured NULL rows (IS DISTINCT FROM)") {
    val out = Relational.filterNullsafe(spark, sf0001)
    val segs = out.collect().map(r => Option(r.getString(0)))
    assert(segs.contains(None), "NULL segment row must survive the null-safe filter")
    assert(!segs.contains(Some("AUTOMOBILE")))
  }

  // ---- §2.C: join semantics on mini tables -------------------------------
  test("left/semi/anti/full joins preserve and drop the right rows") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((1, "x"), (1, "y"), (3, "z")).toDF("k", "rv")
    assert(l.join(r, Seq("k"), "left").count() === 4)        // 2 for k=1
    assert(l.join(r, Seq("k"), "left_semi").count() === 2)   // k=1,3
    assert(l.join(r, Seq("k"), "left_anti").collect().map(_.getInt(0)).toSeq === Seq(2))
    val full = l.join(r.filter(col("k") =!= 1), Seq("k"), "full")
    assert(full.count() === 3)
  }

  test("as-of join picks the latest order at/before ts with key tie-break") {
    val ev = Seq((100L, "2020-06-01", 7L)).toDF("event_id", "ts", "user_id")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"))
    val od = Seq(
      (1L, 7L, "2020-01-01"), (2L, 7L, "2020-05-01"), (3L, 7L, "2020-05-01"),
      (9L, 7L, "2021-01-01") // after ts — must be excluded
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
    val best = ev.join(od, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .groupBy("event_id")
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
      .select(col("best.o_orderkey")).head().getLong(0)
    assert(best === 3L, "same-date tie must break to the larger key")
  }

  // ---- §2.D: arg-max tie-break -------------------------------------------
  test("max_by/min_by with struct tie-break is deterministic under ties") {
    val df = Seq((1, 10L, 5.0), (1, 20L, 5.0), (1, 30L, 1.0)).toDF("g", "k", "v")
    val r = df.groupBy("g").agg(
      max_by(col("k"), struct(col("v"), col("k"))).as("top"),
      min_by(col("k"), struct(col("v"), col("k"))).as("bottom")).head()
    assert(r.getLong(1) === 20L) // tie on v=5.0 → larger k
    assert(r.getLong(2) === 30L)
  }

  // ---- §2.E: window frames ----------------------------------------------
  test("running sum per group ends at the group total") {
    val out = Windows.winRunning(spark, sf0001)
    val last = out.groupBy("o_custkey").agg(max("running").as("final"))
    val totals = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("total"))
    assert(last.join(totals, "o_custkey")
      .filter(abs(col("final") - col("total")) > 0.011).count() === 0)
  }

  test("explicit unbounded frame makes last_value the true group last") {
    val out = Windows.winFirstLast(spark, sf0001)
    // per customer, first_ok/last_ok must be constant across rows
    assert(out.groupBy("o_custkey")
      .agg(countDistinct("first_ok").as("f"), countDistinct("last_ok").as("l"))
      .filter(col("f") =!= 1 || col("l") =!= 1).count() === 0)
  }

  // ---- §2.G: multiset semantics ------------------------------------------
  test("intersectAll/exceptAll keep multiplicities") {
    val a = Seq("x", "x", "x", "y").toDF("v")
    val b = Seq("x", "x", "z").toDF("v")
    assert(a.intersectAll(b).count() === 2)
    assert(a.exceptAll(b).collect().map(_.getString(0)).sorted.toSeq === Seq("x", "y"))
  }

  // ---- §2.H: dialect traps ----------------------------------------------
  test("day-of-week is emitted as a name (numeric variants diverge)") {
    val dows = Functions.dateFuncs(spark, sf0001)
      .select("dow").distinct().collect().map(_.getString(0)).toSet
    assert(dows.subsetOf(Set("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")))
  }

  test("decimal sums are exact (no rounding involved)") {
    val out = Functions.castDecimal(spark, sf0001).collect()
    out.foreach { r =>
      assert(r.getString(2).matches("""\d+\.\d{2}"""), "gross is a full-precision 2dp string")
      assert(r.getString(3).matches("""\d+\.\d{6}"""), "net keeps scale 6 exactly")
    }
  }

  test("json family parses the props shape") {
    val r = Functions.jsonFuncs(spark, sf0001).head()
    assert(r.getString(1).toInt === r.getLong(2).toInt)
    assert(r.getString(3) === s"""{"k":${r.getLong(2)}}""")
  }

  // ---- §2.A: idempotent sink ---------------------------------------------
  test("idempotent partition re-load leaves totals unchanged") {
    val r = SourcesSinks.sinkIdempotent(spark, sf0001).head()
    val direct = Tables.orders(spark, sf0001).count()
    assert(r.getLong(0) === direct, "partition overwrite must not duplicate rows")
  }

  // ---- §2.I: dedup --------------------------------------------------------
  test("stream dedup restores exact original aggregates") {
    val deduped = Streaming.streamDedup(spark, sf0001)
    val original = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("val"))
      .orderBy(col("event_type").asc)
    assert(deduped.collect().toSeq === original.collect().toSeq)
  }

  // ---- HLL accuracy (no-oracle op, SURVEY §2.D) --------------------------
  test("approx_count_distinct within 5% rsd of exact") {
    val approx = Aggregates.aggApproxHll(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Aggregates.aggDistinct(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e <= 0.15, s"$k: approx=${approx(k)} exact=$e")
    }
  }
}
