package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.E — window functions.
  *
  * Scale notes: Spark's `WindowExec` is sort-based and spillable; each
  * window below partitions by a high-cardinality key (customer/user), so
  * the shuffle spreads evenly across executors and per-partition state
  * stays small — the shape that survives 100 TB. Global-order windows are
  * avoided except over pre-aggregated day-level data (≤ a few thousand
  * rows regardless of input scale). Determinism: every ORDER BY inside a
  * window carries a unique-key tie-break (§2.Z.6); ntile uses a fully
  * unique ordering (its result depends on intra-tie row order).
  */
object Windows {

  /** Top-3 orders per customer via row_number — the per-group top-k that
    * needs no global sort. */
  def winTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey").asc, col("rn").asc)
  }

  /** rank / dense_rank / percent_rank / cume_dist over REAL ties (price
    * bucket), plus ntile over a unique ordering. */
  def winRanks(spark: SparkSession, dir: String): DataFrame = {
    val bucket = floor(col("o_totalprice") / 50000).as("bucket")
    val wTies = Window.partitionBy("o_orderpriority").orderBy(col("bucket").desc)
    val wUniq = Window.partitionBy("o_orderpriority")
      .orderBy(col("bucket").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), bucket)
      .withColumn("rnk", rank().over(wTies))
      .withColumn("drnk", dense_rank().over(wTies))
      .withColumn("pr", round(percent_rank().over(wTies), 6))
      .withColumn("cd", round(cume_dist().over(wTies), 6))
      .withColumn("nt", ntile(4).over(wUniq))
      .orderBy(col("o_orderpriority").asc, col("bucket").desc, col("o_orderkey").asc)
  }

  /** Per-user event deltas: `value - lag(value)`, `lead(ts)` gap in µs. */
  def winLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("delta", round(col("value") - lag("value", 1).over(w), 2))
      .withColumn("gap_us", unix_micros(lead("ts", 1).over(w)) - unix_micros(col("ts")))
      .orderBy(col("user_id").asc, col("ts").asc, col("event_id").asc)
  }

  /** Running revenue per customer (rows unbounded-preceding..current). */
  def winRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running", round(sum("o_totalprice").over(w), 2))
      .orderBy(col("o_custkey").asc, col("o_orderdate").asc, col("o_orderkey").asc)
  }

  /** 7-row moving average over pre-aggregated daily revenue (day grain ⇒
    * bounded row count at any input scale). */
  def winMoving(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val w = Window.orderBy(col("day").asc).rowsBetween(-6, 0)
    daily
      .withColumn("ma7", round(avg("rev").over(w), 6))
      .orderBy(col("day").asc)
  }

  /** 30-day trailing sum via a RANGE frame over epoch-seconds (numeric
    * range frame works identically on both engines). */
  def winRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .withColumn("day_s", unix_seconds(col("day")))
    val w = Window.orderBy(col("day_s").asc).rangeBetween(-29L * 86400, 0)
    daily
      .withColumn("trailing30", round(sum("rev").over(w), 2))
      .select("day", "rev", "trailing30")
      .orderBy(col("day").asc)
  }

  /** first_value/last_value with an EXPLICIT unbounded frame (the default
    * frame ends at CURRENT ROW — a classic silent-wrong-answer trap). */
  def winFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .withColumn("first_ok", first("o_orderkey").over(w))
      .withColumn("last_ok", last("o_orderkey").over(w))
      .select("o_custkey", "o_orderkey", "first_ok", "last_ok")
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** Ratio-to-report: each nation's share of its region's revenue and of
    * the global total — unpartitioned and partitioned window aggregates
    * over a pre-aggregated (tiny) frame, so the global window is safe at
    * any input scale. */
  def winRatio(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum("c_acctbal"), 2).as("bal"))
    perNation
      .withColumn("region_share",
        round(col("bal") / sum("bal").over(Window.partitionBy("r_name")), 6))
      .withColumn("global_share",
        round(col("bal") / sum("bal").over(Window.partitionBy()), 6))
      .orderBy(col("r_name").asc, col("n_name").asc)
  }

  /** Rolling exact percentiles (7-row median + p90 of daily revenue per
    * priority) — distribution statistics as WINDOW functions. Partitioned
    * by priority over a day-grain pre-aggregate: O(days) rows per
    * partition at any input scale. Inputs are pre-rounded so both engines
    * interpolate over identical values (linear interpolation on both —
    * §2.Z). */
  def winPercentile(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val w = Window.partitionBy("prio").orderBy(col("day").asc).rowsBetween(-6, 0)
    daily
      .withColumn("med7", round(expr("percentile(rev, 0.5)").over(w), 4))
      .withColumn("p90_7", round(expr("percentile(rev, 0.9)").over(w), 4))
      .orderBy(col("prio").asc, col("day").asc)
  }

  /** Streaks (gaps-and-islands on a condition): per priority, runs of
    * consecutive days whose daily revenue clears a threshold — island id
    * = row_number difference trick, then per-island length, reported as
    * streak count / longest / average per priority. Day-grain frame
    * partitioned by priority. */
  def winStreak(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val all = Window.partitionBy("prio").orderBy(col("day").asc)
    val hit = Window.partitionBy("prio", "flag").orderBy(col("day").asc)
    daily
      .withColumn("flag", col("rev") > 300000)
      .withColumn("grp", row_number().over(all) - row_number().over(hit))
      .filter(col("flag"))
      .groupBy("prio", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("prio")
      .agg(count(lit(1)).as("streaks"), max("len").as("longest"),
        round(avg("len"), 6).as("avg_len"))
      .orderBy(col("prio").asc)
  }

  /** Distribution ranks per partition — ntile quartiles, cume_dist,
    * percent_rank over customer balances within each nation: the "assign
    * every row its place in the distribution" window family (quartile
    * bucketing is how a corpus build splits quality tiers). One window
    * sort per nation partition — high-cardinality key, even spread; all
    * three functions share the single sort. Tie-break on c_custkey makes
    * every rank deterministic (§2.Z). cd/pr stay UNROUNDED: they are
    * small-integer ratios, so the division doubles are bit-identical
    * across engines — while round() impls DIVERGE on the exact-decimal
    * .5 ties these ratios love to produce (333/640 = 0.5203125 rounded
    * to 6dp differs between Spark and DuckDB; bit sf0.1 in round 5). */
  def winNtileCume(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
      .orderBy(col("c_nationkey").asc, col("c_custkey").asc)
  }

  /** Running COUNT(DISTINCT) over an ordered window — which Spark's
    * WindowExec does not support directly — via the scale-safe idiom:
    * reduce each (region, customer) to its FIRST active month with a hash
    * aggregate, count new customers per month, then running-sum that
    * pre-aggregated frame. The window only ever sees regions × months
    * rows (bounded by the calendar, not the data), while the distinct
    * work rides the partial-aggregating groupBy — the formulation that
    * survives 100 TB where a naive per-row distinct window cannot. */
  def winDistinctCount(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
    val firstMon = joined
      .groupBy(col("r_name"), col("o_custkey"))
      .agg(min(date_trunc("month", col("o_orderdate"))).as("mon"))
    val perMon = firstMon.groupBy("r_name", "mon").agg(count(lit(1)).as("new_cust"))
    val w = Window.partitionBy("r_name").orderBy(col("mon").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perMon
      .withColumn("distinct_custs", sum("new_cust").over(w))
      .select("r_name", "mon", "distinct_custs")
      .orderBy(col("r_name").asc, col("mon").asc)
  }

  /** win_topk's semantics through the NATIVE per-key top-k operator
    * (plans/TopKPerKey.scala): a map-side partial phase reduces each
    * task to ≤ k rows per local key with bounded heaps BEFORE the
    * shuffle — the window formulation must shuffle and sort every row.
    * Same oracle as win_topk (minus the rank column): the custom
    * operator must be invisible in the results. */
  def winTopkNative(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey.topK(
      Tables.orders(spark, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
      key = "o_custkey", ord = "o_totalprice", tie = "o_orderkey", k = 3)
      .orderBy(col("o_custkey").asc, col("o_totalprice").desc, col("o_orderkey").asc)

  /** IGNORE NULLS window navigation: previous non-NULL revenue (lag) and
    * last-observation-carried-forward (last_value) per customer, where
    * 'F'-status orders contribute NULL. The SQL-standard NULL-skipping
    * navigation — distinct from a plain lag + coalesce, which can only
    * reach back ONE row. Same sorted-window scale shape as the rest of
    * §2.E (high-cardinality customer partitions). */
  def winIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val rev = when(col("o_orderstatus") === "F", lit(null))
      .otherwise(col("o_totalprice"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("rev", rev)
      .select(col("o_custkey"), col("o_orderkey"),
        round(lag(col("rev"), 1, null, ignoreNulls = true).over(w), 2).as("prev_ok"),
        round(last(col("rev"), ignoreNulls = true).over(wRun), 2).as("locf"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** SQL:2011 GROUPS frame mode (round-8 addendum) — the third standard
    * window frame unit, which Spark implements for neither SQL nor the
    * DataFrame API (ROWS and RANGE only; so does DuckDB — "GROUPS mode …
    * not implemented yet"). `GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING`
    * frames a row by PEER GROUPS of the order key: the previous distinct
    * key's rows + all peers of the current key + the next distinct key's
    * rows, regardless of how many rows each group holds or how far apart
    * the key values sit (RANGE would use value distance, ROWS would cut
    * peer groups in half).
    *
    * Re-expression: dense_rank() assigns each peer group a consecutive
    * integer, and a RANGE frame of ±1 over that rank IS the GROUPS frame
    * — consecutive ranks ⇔ adjacent groups, and rows sharing a rank are
    * exactly the peers. Both windows share one (event_type, day)
    * exchange+sort: the rank window and the frame window sort compatibly,
    * so the plan pays a single shuffle like every other §2.E entry. */
  def winGroupsFrame(spark: SparkSession, dir: String): DataFrame = {
    val wRank = Window.partitionBy("event_type").orderBy(col("day").asc)
    val wFrame = Window.partitionBy("event_type").orderBy(col("g").asc)
      .rangeBetween(-1, 1)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))
      .withColumn("g", dense_rank().over(wRank))
      .select(col("event_id"), col("event_type"), col("day"),
        round(sum("value").over(wFrame), 2).as("grp_sum"),
        count(lit(1)).over(wFrame).as("grp_n"))
      .orderBy(col("event_id").asc)
  }

  /** Rolling-regression trend (round-8 wave 17) — per event type, the OLS
    * slope and R² of daily revenue against the day index over the
    * trailing 28 OBSERVATIONS (row frame: an outage gap widens the
    * calendar span rather than shrinking the sample — the monitoring
    * convention). regr_* are merged-moment aggregates, so the frame is
    * one windowed moment state, never a per-row refit; day index is an
    * exact integer, revenue pre-rounded, and the 4dp output round absorbs
    * the frame-evaluation-order ulps between Spark's sequential buffer
    * and DuckDB's segment-tree window machinery. Day-grain frame ⇒
    * O(days·types) rows at any event volume. */
  def winRegression(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
      .withColumn("x", datediff(col("day"), to_date(lit("2024-01-01"))))
    val w = Window.partitionBy("event_type").orderBy(col("day").asc)
      .rowsBetween(-27, Window.currentRow)
    daily
      .withColumn("n_obs", count(lit(1)).over(w))
      .withColumn("slope", round(regr_slope(col("rev"), col("x")).over(w), 4))
      .withColumn("r2", round(regr_r2(col("rev"), col("x")).over(w), 4))
      .select("event_type", "day", "rev", "n_obs", "slope", "r2")
      .orderBy(col("event_type").asc, col("day").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_regression"     -> (winRegression _),
    "win_groups_frame"   -> (winGroupsFrame _),
    "win_ignore_nulls"   -> (winIgnoreNulls _),
    "win_topk_native"    -> (winTopkNative _),
    "win_distinct_count" -> (winDistinctCount _),
    "win_ntile_cume"  -> (winNtileCume _),
    "win_streak"      -> (winStreak _),
    "win_percentile"  -> (winPercentile _),
    "win_ratio"       -> (winRatio _),
    "win_topk"        -> (winTopk _),
    "win_ranks"       -> (winRanks _),
    "win_lag_lead"    -> (winLagLead _),
    "win_running"     -> (winRunning _),
    "win_moving"      -> (winMoving _),
    "win_range_frame" -> (winRangeFrame _),
    "win_first_last"  -> (winFirstLast _))

  val oracleSql: Map[String, String] = Map(
    "win_regression" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    round(sum(value), 2) AS rev
        |  FROM events GROUP BY event_type, day),
        |d AS (
        |  SELECT event_type, day, rev,
        |    date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) AS x
        |  FROM daily)
        |SELECT event_type, day, rev,
        |  count(*) OVER w AS n_obs,
        |  round(regr_slope(rev, x) OVER w, 4) AS slope,
        |  round(regr_r2(rev, x) OVER w, 4) AS r2
        |FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
        |  ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type ASC, day ASC""".stripMargin,
    // DuckDB lacks GROUPS mode too, so the oracle states the same
    // dense_rank + RANGE-over-rank identity — an equivalence both engines
    // evaluate through entirely different window machinery.
    "win_groups_frame" ->
      """WITH r AS (
        |  SELECT event_id, event_type, CAST(ts AS DATE) AS day, value,
        |    dense_rank() OVER (PARTITION BY event_type
        |      ORDER BY CAST(ts AS DATE) ASC) AS g
        |  FROM events)
        |SELECT event_id, event_type, day,
        |  round(sum(value) OVER w, 2) AS grp_sum,
        |  count(*) OVER w AS grp_n
        |FROM r
        |WINDOW w AS (PARTITION BY event_type ORDER BY g ASC
        |  RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |ORDER BY event_id ASC""".stripMargin,
    "win_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey,
        |  round(lag(CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_totalprice END
        |        IGNORE NULLS) OVER w, 2) AS prev_ok,
        |  round(last_value(CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_totalprice END
        |        IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS locf
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "win_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "win_distinct_count" ->
      """WITH fm AS (
        |  SELECT r_name, o_custkey, min(date_trunc('month', o_orderdate)) AS mon
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, o_custkey),
        |pm AS (SELECT r_name, mon, count(*) AS new_cust FROM fm GROUP BY r_name, mon)
        |SELECT r_name, mon,
        |  CAST(sum(new_cust) OVER (PARTITION BY r_name ORDER BY mon ASC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS distinct_custs
        |FROM pm ORDER BY r_name ASC, mon ASC""".stripMargin,
    "win_ntile_cume" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_nationkey ASC, c_custkey ASC""".stripMargin,
    "win_streak" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, date_trunc('day', o_orderdate) AS day,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY prio, day),
        |g AS (
        |  SELECT prio, day, rev > 300000 AS flag,
        |    row_number() OVER (PARTITION BY prio ORDER BY day ASC) -
        |    row_number() OVER (PARTITION BY prio, rev > 300000 ORDER BY day ASC) AS grp
        |  FROM daily),
        |runs AS (
        |  SELECT prio, grp, count(*) AS len FROM g WHERE flag GROUP BY prio, grp)
        |SELECT prio, count(*) AS streaks, CAST(max(len) AS BIGINT) AS longest,
        |  round(avg(len), 6) AS avg_len
        |FROM runs GROUP BY prio ORDER BY prio ASC""".stripMargin,
    "win_percentile" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, date_trunc('day', o_orderdate) AS day,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY prio, day)
        |SELECT prio, day, rev,
        |  round(quantile_cont(rev, 0.5) OVER w, 4) AS med7,
        |  round(quantile_cont(rev, 0.9) OVER w, 4) AS p90_7
        |FROM daily
        |WINDOW w AS (PARTITION BY prio ORDER BY day ASC
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY prio ASC, day ASC""".stripMargin,
    "win_ratio" ->
      """WITH pn AS (
        |  SELECT r_name, n_name, round(sum(c_acctbal), 2) AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, bal,
        |  round(bal / sum(bal) OVER (PARTITION BY r_name), 6) AS region_share,
        |  round(bal / sum(bal) OVER (), 6) AS global_share
        |FROM pn ORDER BY r_name ASC, n_name ASC""".stripMargin,
    "win_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey ASC, rn ASC""".stripMargin,
    "win_ranks" ->
      """SELECT o_orderpriority, o_orderkey, CAST(floor(o_totalprice/50000) AS BIGINT) AS bucket,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd,
        |  ntile(4) OVER wu AS nt
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice/50000) DESC),
        |       wu AS (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice/50000) DESC, o_orderkey ASC)
        |ORDER BY o_orderpriority ASC, bucket DESC, o_orderkey ASC""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id, ts, value,
        |  round(value - lag(value, 1) OVER w, 2) AS delta,
        |  epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id ASC, ts ASC, event_id ASC""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders ORDER BY o_custkey ASC, o_orderdate ASC, o_orderkey ASC""".stripMargin,
    "win_moving" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice),2) AS rev
        |  FROM orders GROUP BY day)
        |SELECT day, rev,
        |  round(avg(rev) OVER (ORDER BY day ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
        |FROM daily ORDER BY day ASC""".stripMargin,
    "win_range_frame" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice),2) AS rev
        |  FROM orders GROUP BY day)
        |SELECT day, rev,
        |  round(sum(rev) OVER (ORDER BY epoch(day) ASC RANGE BETWEEN 2505600 PRECEDING AND CURRENT ROW), 2) AS trailing30
        |FROM daily ORDER BY day ASC""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin)
}
