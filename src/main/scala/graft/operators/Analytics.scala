package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics operators over the event stream: ordered-step
  * funnels and cohort retention — the two queries every event pipeline
  * ends up serving.
  *
  * Scale notes: both are single hash aggregations keyed by user (funnel:
  * conditional min-timestamps per step, then one tiny rollup; retention:
  * per-user cohort min + membership flags) — partial aggregation
  * compresses each user to one row before the shuffle, so they scale with
  * distinct users, not event volume.
  */
object Analytics {

  /** Ordered funnel view→click→purchase on FIRST occurrences: a user
    * converts step k only if its first step-k event follows the first
    * step-(k−1) event. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("users"),
      count(col("t_view")).as("viewed"),
      count(when(col("t_click") > col("t_view"), lit(1))).as("clicked_after_view"),
      count(when(col("t_click") > col("t_view") && col("t_purchase") > col("t_click"),
        lit(1))).as("purchased_after_click"))
  }

  /** Weekly cohort retention: users grouped by first-seen day; retained =
    * any event in days [7, 14) after the cohort day. */
  def funnelRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("c_day"))
    ev.join(cohort, "user_id")
      .groupBy("user_id", "c_day")
      .agg(max(when(datediff(col("day"), col("c_day")).between(7, 13), lit(1))
        .otherwise(lit(0))).as("retained_w2"))
      .groupBy("c_day")
      .agg(count(lit(1)).as("cohort_users"), sum("retained_w2").as("retained"))
      .orderBy(col("c_day").asc)
  }

  /** Equi-width histogram of order value: 10 fixed 50k-wide buckets over
    * [0, 500k), top bucket open. Pure map-side bucketing + one hash
    * aggregate — the data-profiling shape that costs a single pass at any
    * scale (contrast equi-DEPTH binning, which needs the quantile sketch
    * in agg_approx_pctl first). Bucket bounds are literals, not data-
    * dependent min/max, so the query stays one job with no driver
    * round-trip. */
  def histEquiwidth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket", least(lit(9), floor(col("o_totalprice") / 50000)).cast("int"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("rev"),
        round(min("o_totalprice"), 2).as("lo_seen"),
        round(max("o_totalprice"), 2).as("hi_seen"))
      .withColumn("lo", (col("bucket") * 50000).cast("double"))
      .orderBy(col("bucket").asc)

  /** Equi-DEPTH histogram of order value: 10 buckets holding ~equal row
    * counts, boundaries = the exact deciles by rank (percentile_disc
    * semantics: smallest value whose cumulative distribution ≥ p — actual
    * data values, so both engines pick identical cutpoints; interpolated
    * percentiles would diverge in ulps). Bucket = number of cutpoints
    * strictly below the value, so ties collapse deterministically into
    * the lower bucket.
    *
    * The cutpoint pass is RANK-SELECTION over a value→count pre-aggregate,
    * not nine percentile_disc states: a distributed hash agg collapses the
    * row multiset to (value, cnt) pairs, a running sum over the distinct
    * values yields cumulative ranks, and all nine deciles fall out of ONE
    * conditional-min aggregate over that table. The old formulation (nine
    * independent `percentile_disc WITHIN GROUP` aggregates, kept as the
    * DuckDB oracle text and in EqdepthSemanticsSpec's reference impl)
    * buffered and sorted nine full copies of the column on a single
    * reducer — 16 s on the sf0.1 driver bench vs ~1 s for this shape.
    *
    * Scale (round 10 — VERDICT r9's one named scale-killer): the
    * cumulative ranks come from the TWO-LEVEL prefix sum
    * (agg_mannwhitney's idiom) instead of an unpartitioned value-grain
    * window. o_totalprice is ~order-count-distinct, so the r9 form's
    * `sum over Window.orderBy(v)` was a single-task sort that GROWS
    * WITH THE CORPUS (~15 M rows on one reducer at 100× sf0.1);
    * here the within-BIN running counts ride windows partitioned by a
    * coarse 5000-unit price bin (parallel, small frames) and only the
    * bin-offset cumsum is unpartitioned — over the ~100-row bin frame,
    * bounded by the price DOMAIN, not row count. Cuts then ride a
    * 1-row broadcast into a map-side bucket assignment + hash agg (the
    * crossJoin(broadcast) scalar idiom — allowlisted in
    * PlanSnapshotSpec). For a truly unbounded domain swap the cutpoint
    * pass for the approx_percentile sketch (agg_approx_pctl). */
  def histEqdepth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, dir).select(col("o_totalprice"))
    val vc = orders.groupBy(col("o_totalprice").as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("bin", floor(col("v") / 5000.0).cast("long"))
    // global cumulative count = within-bin INCLUSIVE prefix + bin offset;
    // exact integers in any grouping, so identical to the single-window
    // form row for row
    val wBin = Window.partitionBy("bin").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // the grand total rides the bin frame as one more window over the
    // same ~100-row sort (no separate total branch, no scalar crossJoin)
    val offs = vc.groupBy("bin").agg(sum("cnt").as("btot"))
      .withColumn("off", coalesce(sum("btot").over(wOff), lit(0L)))
      .withColumn("n_total", sum("btot").over(wAll))
      .select("bin", "off", "n_total")
    // merge hint, not broadcast: this join runs INSIDE the AQE-off
    // materialize below, where a (planned or stats-auto) broadcast builds
    // its relation in a DEDICATED job — the in-job shuffle of a ~100-row
    // bin frame is free by comparison (measured: the auto-BHJ form
    // scheduled 2 extra jobs per call, each billed ~0.4 s on the
    // contended driver)
    val cum = vc.withColumn("wb", sum("cnt").over(wBin))
      .join(offs.hint("merge"), "bin")
      .withColumn("cum", col("off") + col("wb"))
    // percentile_disc(k/10) = min v with cume_dist(v) = cum/N >= k/10, both
    // sides double — the same comparison Spark's PercentileDisc evaluates,
    // proven tie-for-tie against it in EqdepthSemanticsSpec.
    val cutCols = (1 to 9).map(k =>
      min(when(col("cum") / col("n_total") >= k / 10.0, col("v"))).as(s"c$k"))
    // the whole cutpoint pass (value-grain agg, two-level prefix sum,
    // conditional-min selection) collapses into ONE AQE-off write job of
    // a 1-row frame — under AQE its five exchanges each scheduled a
    // stage job, the contended driver's ~0.4 s/job tax (VERDICT r9)
    val cuts = MemoFrames.materialize(spark, "eqdepth_cuts",
      cum.agg(cutCols.head, cutCols.tail: _*))
    val bucket = (1 to 9).map(k => (col("o_totalprice") > col(s"c$k")).cast("int"))
      .reduce(_ + _)
    orders.crossJoin(broadcast(cuts))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo_seen"),
        round(max("o_totalprice"), 2).as("hi_seen"))
      .orderBy(col("bucket").asc)
  }

  /** The original nine-percentile_disc formulation — retained ONLY as the
    * reference implementation EqdepthSemanticsSpec compares against (it is
    * also verbatim the DuckDB oracle text). Not a declared query: its nine
    * single-reducer value buffers are exactly what histEqdepth replaces. */
  private[graft] def histEqdepthDisc(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH c AS (
        |  SELECT
        |    percentile_disc(0.1) WITHIN GROUP (ORDER BY o_totalprice) AS c1,
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY o_totalprice) AS c2,
        |    percentile_disc(0.3) WITHIN GROUP (ORDER BY o_totalprice) AS c3,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY o_totalprice) AS c4,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS c5,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY o_totalprice) AS c6,
        |    percentile_disc(0.7) WITHIN GROUP (ORDER BY o_totalprice) AS c7,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY o_totalprice) AS c8,
        |    percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS c9
        |  FROM orders),
        |b AS (
        |  SELECT o_totalprice,
        |    CAST(o_totalprice > c1 AS INT) + CAST(o_totalprice > c2 AS INT) +
        |    CAST(o_totalprice > c3 AS INT) + CAST(o_totalprice > c4 AS INT) +
        |    CAST(o_totalprice > c5 AS INT) + CAST(o_totalprice > c6 AS INT) +
        |    CAST(o_totalprice > c7 AS INT) + CAST(o_totalprice > c8 AS INT) +
        |    CAST(o_totalprice > c9 AS INT) AS bucket
        |  FROM orders CROSS JOIN c)
        |SELECT bucket, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo_seen,
        |  round(max(o_totalprice), 2) AS hi_seen
        |FROM b GROUP BY bucket ORDER BY bucket ASC""".stripMargin)
  }

  /** Batch sessionization (round-7 addendum) under the STRICT-gap
    * definition: a new session starts when the inactivity gap EXCEEDS
    * 30 minutes. Deliberate contrast with stream_session, which uses
    * `>=` because Spark's `session_window` is end-exclusive (an event
    * exactly 30 min after its predecessor starts a new session there) —
    * the two definitions disagree on boundary-exact events, a real
    * interop trap when a batch backfill must match a third-party
    * sessionizer that treats the timeout as inclusive (most web
    * analytics stacks do). Output is also disjoint from stream_session:
    * exact integer-µs session DURATION and the 6dp value sum — the
    * session-length metrics — where stream_session reports the window
    * bounds themselves.
    *
    * Shape: lag + running-sum windows partitioned by user_id (the
    * gaps-and-islands idiom) + one hash aggregate on (user, session).
    * Everything shuffles ONCE on user_id and stays there — the windows
    * and the final agg share the partitioning, so session assembly is a
    * single exchange at any event volume. Skew = one hyperactive user;
    * bounded by per-user event counts, the same exposure stream_session
    * accepts, and salvageable by splitting on (user, day) if a key ever
    * exceeds a partition. Gap arithmetic is integer µs on both engines
    * (Tables.events ns→µs truncation), so session boundaries agree
    * exactly; the value sum rounds 6dp to absorb accumulation order. */
  def sessBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 1800000000L // 30 min
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_n", sum("new_sess").over(w))
      .groupBy("user_id", "sess_n")
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"),
        round(sum("value"), 6).as("total_value"))
      .orderBy(col("user_id").asc, col("sess_n").asc)
  }

  /** Sequence-pattern match over per-user event histories (round-8
    * addendum) — the MATCH_RECOGNIZE / CEP class of operator, which Spark
    * SQL lacks natively. Each user's events are rendered as a symbol
    * string in (ts, event_id) order (v=view c=click p=purchase s=signup
    * e=error) and matched against the conversion pattern
    * `v[^e]*c[^e]*p`: a view, later a click, later a purchase, with no
    * error anywhere between — the "clean conversion path" question a
    * fixed-column funnel (funnel_steps) cannot express, because the
    * NEGATION (no intervening error) and the ORDER constraint live in the
    * same predicate.
    *
    * Shape: ONE exchange. The symbol projection is map-side; collect_list
    * partially aggregates per user inside each task; the regex runs
    * map-side on the final per-user row. State per key is the user's
    * event count — at 100 TB the same query windows the history (e.g.
    * sessionize first, match per session) so per-key state stays bounded;
    * the operator shape (group → ordered render → regex) is unchanged.
    * Determinism: ties on ts break by the unique event_id, and both
    * engines do leftmost unanchored regex search with identical character
    * class semantics, so the boolean agrees row-for-row with DuckDB. */
  def seqPattern(spark: SparkSession, dir: String): DataFrame = {
    val sym = when(col("event_type") === "view", "v")
      .when(col("event_type") === "click", "c")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "signup", "s")
      .otherwise("e")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), sym.as("sym"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("sym")))),
          x => x.getField("sym")), "").as("seq"))
      .select(col("user_id"), col("n_events"),
        col("seq").rlike("v[^e]*c[^e]*p").cast("int").as("matched"))
      .orderBy(col("user_id").asc)
  }

  /** Interval union / coverage (round-8 addendum) — the sweep-line
    * "merge overlapping intervals" operator (Allen-algebra union) that
    * plain SQL aggregates cannot express: each supplier's lineitems open
    * a shipping window [shipdate, shipdate + quantity days), and the
    * question is how many DISTINCT days the union of those windows
    * covers, in how many disjoint busy stretches (islands) — double-
    * counting overlaps is exactly the bug naive sum(duration) has.
    *
    * Classic gaps-and-islands sweep: order each supplier's windows by
    * start, carry a running max of window ends over STRICTLY PRIOR rows;
    * a row opens a new island iff its start exceeds every prior end.
    * island id = running count of openers; per-island coverage is
    * max(end) − min(start) (valid because islands are overlap-chained by
    * construction).
    *
    * Shape: ONE (l_suppkey) exchange serves both windows (compatible
    * sorts) AND the island rollup AND the final per-supplier aggregate —
    * the plan is scan → exchange → window ×2 → two hash aggs reusing the
    * partitioning. At 100 TB per-key state is the supplier's line count;
    * skewed suppliers would sessionize by coarse time range first
    * (identical operator tree per range, island stitching at range
    * edges).
    *
    * Determinism: ends derive as integer day numbers (datediff from
    * epoch + int-cast quantity — pure int64 arithmetic both engines
    * agree on); equal-start rows land in the same island whichever sorts
    * first (start ≤ running end follows from qty ≥ 1), so the sweep is
    * insensitive to the one unordered tie. */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"),
        datediff(date_trunc("day", col("l_shipdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("sd"),
        col("l_quantity").cast("long").as("qty"))
      .withColumn("ed", col("sd") + col("qty"))
    val w = Window.partitionBy("suppkey").orderBy(col("sd").asc, col("ed").asc)
    base
      .withColumn("prev_max_ed",
        max(col("ed")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opener",
        when(col("prev_max_ed").isNull || col("sd") > col("prev_max_ed"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("opener")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("suppkey"), col("island"))
      .agg(count(lit(1)).as("lines"),
        min(col("sd")).as("isl_start"), max(col("ed")).as("isl_end"))
      .groupBy("suppkey")
      .agg(sum("lines").as("n_lines"),
        count(lit(1)).as("islands"),
        sum(col("isl_end") - col("isl_start")).as("covered_days"),
        (max(col("isl_end")) - min(col("isl_start"))).as("span_days"))
      .orderBy(col("suppkey").asc)
  }

  /** Binned Gaussian kernel density estimate (round-8 addendum) — the
    * smooth-density view of o_totalprice dashboards draw where
    * hist_equiwidth draws bars: density evaluated at 21 fixed grid
    * points with bandwidth h = 20000, over 5000-unit PRE-BINNED counts.
    * Binned KDE is the scale form — exact KDE is an all-pairs kernel
    * sum (rows × eval points over raw data); binning first collapses
    * the corpus to ~100 (bin, count) rows in one partial+final hash
    * agg, and the kernel sum then runs on bins × points ≈ 2100 rows of
    * pure arithmetic, the standard accuracy/cost trade (error bounded
    * by bin width ≪ bandwidth).
    *
    * Determinism: bin ids and centers are exact integers; the grid is
    * literal; each kernel term is one exp() whose last-ulp divergence
    * is absorbed by rounding the 1e6-scaled density to 6dp (densities
    * are O(1e-6) here, so round-at-6dp of the RAW density would quantize
    * to one digit — the ppm scaling keeps 6 significant digits). */
  def histKde(spark: SparkSession, dir: String): DataFrame = {
    val h = 20000.0
    val bins = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / 5000.0).cast("long").as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
    val tot = bins.agg(sum("cnt").as("n"))
    val pts = spark.range(0, 21).select((col("id") * 25000L).as("x"))
    pts.crossJoin(broadcast(bins))
      .crossJoin(broadcast(tot))
      .withColumn("u", (col("x") - (col("b") * 5000L + 2500L)) / h)
      .withColumn("term", col("cnt") * exp(col("u") * col("u") / -2.0))
      .groupBy("x")
      .agg(max("n").as("n"), sum("term").as("s"))
      .select(col("x"), col("n"),
        round(lit(1e6) * col("s")
          / (col("n") * h * math.sqrt(2.0 * math.Pi)), 6).as("density_ppm"))
      .orderBy(col("x").asc)
  }

  /** Conversion-latency distribution (round-8 wave 16) — funnel_steps
    * counts WHO converts; this measures HOW FAST. Semantics (exact, per
    * ADVICE r8): a user converts iff their OVERALL first purchase falls
    * strictly after their overall first view, and the latency is that
    * global-first-purchase − first-view delta. A user whose first
    * purchase predates their first view is NOT counted even if they
    * purchased again later — deliberate: such a user was already a buyer
    * before the funnel entry, so a later purchase does not evidence the
    * view→purchase conversion this metric prices. Latencies are integer
    * MICROSECONDS
    * (epoch-µs subtraction — no truncation-direction trap, and every
    * aggregate over them is exact integer arithmetic until the one final
    * division). User-grain frame ⇒ percentile_disc's per-group sort is
    * user-count-sized; the sketch swap (agg_approx_pctl) is the 100 TB
    * path with the identical report shape. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .filter(col("t_view").isNotNull && col("t_purchase") > col("t_view"))
      .select((unix_micros(col("t_purchase")) - unix_micros(col("t_view")))
        .as("lat_us"))
      .createOrReplaceTempView("g_funnel_lat")
    spark.sql(
      """SELECT count(*) AS conversions,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY lat_us) AS BIGINT) AS p25_us,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_us) AS BIGINT) AS p50_us,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_us) AS BIGINT) AS p90_us,
        |  round(avg(lat_us), 2) AS avg_us
        |FROM g_funnel_lat""".stripMargin)
  }

  /** First-order Markov transition matrix (round-9 wave 3) — per ordered
    * event-type pair: transition count and conditional probability
    * P(next | current), from each user's time-ordered event stream. The
    * behavioral-model companion to seq_pattern's fixed-pattern match:
    * the matrix IS the model a next-action predictor or anomaly scorer
    * reads. Ordering is (ts, event_id) so same-timestamp events resolve
    * deterministically; probabilities divide exact integer counts
    * (identical doubles both engines, 6dp display round). One per-user
    * window (user-partitioned — shuffles once on user_id, no global
    * sort) then two vocabulary-sized hash aggs. */
  def seqMarkov(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val c = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        lead("event_type", 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy("from_type").agg(sum("n").as("row_n"))
    c.join(broadcast(t), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("row_n").cast("double"), 6).as("p"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  /** RFM segmentation (round-9 wave 4) — the classic customer-value
    * grid: per customer, Recency (days since last order, vs the corpus
    * ledger date), Frequency (order count), Monetary (revenue in exact
    * cents), each cut into quintiles by ntile(5) with the custkey
    * tie-break (a fully-ordered input makes ntile's bucket assignment
    * deterministic); segments of ≥ 5 customers report census + per-axis
    * profiles. Windows run over the CUSTOMER-grain frame; at extreme
    * customer cardinality each becomes ScaleIdioms.twoLevelRank +
    * ntileFromRank (the exact-equivalent two-level form, in-repo and
    * NtileFormulaSpec-pinned — agg_pareto ships it live). Round 10
    * measured the lazy-frame swap at 5× the window form; round 11
    * re-measured it in the TWO-WRITE shape (customer frame materialized
    * AQE-off, rank chains off the file — ProbeRfmScale) at BOTH fixture
    * scale and the StressGen 10× frame, row-equality verified at both:
    * window 0.7 → 1.4 s vs two-level 4.3 → 6.4 s from 10k → 100k
    * customers (STRESS.md). FLIP TRIGGER: the window form's single-task
    * sort grows linearly in customers while the two-level form's cost is
    * stage-count-dominated; the measured curves cross at roughly 10M+
    * customers (~1000× fixture) — swap the three ntile windows for
    * twoLevelRank + ntileFromRank when the customer-grain frame exceeds
    * ~10M rows. Avgs divide exact integers. The marketing-ops companion
    * to funnel_retention's cohort view. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val ref = broadcast(o.agg(max(to_date(col("o_orderdate"))).as("ref")))
    val c = o.groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        round(round(sum("o_totalprice"), 2) * 100, 0).cast("long").as("mon_cents"))
      .crossJoin(ref)
      .select(col("o_custkey"), datediff(col("ref"), col("last_day")).as("rec_days"),
        col("freq"), col("mon_cents"))
    val s = c.select(col("rec_days"), col("freq"), col("mon_cents"),
      ntile(5).over(Window.orderBy(col("rec_days").asc, col("o_custkey").asc)).as("r"),
      ntile(5).over(Window.orderBy(col("freq").desc, col("o_custkey").asc)).as("f"),
      ntile(5).over(Window.orderBy(col("mon_cents").desc, col("o_custkey").asc)).as("m"))
    s.groupBy("r", "f", "m")
      .agg(count(lit(1)).as("customers"),
        min("rec_days").cast("long").as("min_rec"),
        max("rec_days").cast("long").as("max_rec"),
        round(avg("freq"), 4).as("avg_freq"),
        // round to integer CENTS first, divide after: avg(cents)/100 can
        // land exactly on a .xx5 decimal (sum/22 gave ...690.5 at sf0.1)
        // where Spark's BigDecimal HALF_UP and DuckDB's double rounding
        // disagree; a cents tie is an exactly-representable x.5 double
        // that both engines round half-away identically, and the /100 of
        // the SAME integer is the same double everywhere
        (round(avg("mon_cents"), 0) / 100).as("avg_monetary"))
      .filter(col("customers") >= 5)
      .orderBy(col("r").asc, col("f").asc, col("m").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rfm_segments"     -> (rfmSegments _),
    "seq_markov"       -> (seqMarkov _),
    "funnel_latency"   -> (funnelLatency _),
    "hist_kde"         -> (histKde _),
    "hist_equiwidth"   -> (histEquiwidth _),
    "hist_eqdepth"     -> (histEqdepth _),
    "funnel_steps"     -> (funnelSteps _),
    "funnel_retention" -> (funnelRetention _),
    "sess_batch"       -> (sessBatch _),
    "interval_coverage" -> (intervalCoverage _),
    "seq_pattern"      -> (seqPattern _))

  val oracleSql: Map[String, String] = Map(
    "rfm_segments" ->
      """WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref FROM orders),
        |c AS (
        |  SELECT o_custkey,
        |    date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      (SELECT ref FROM ref)) AS rec_days,
        |    count(*) AS freq,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT)
        |      AS mon_cents
        |  FROM orders GROUP BY o_custkey),
        |s AS (
        |  SELECT rec_days, freq, mon_cents,
        |    ntile(5) OVER (ORDER BY rec_days ASC, o_custkey ASC) AS r,
        |    ntile(5) OVER (ORDER BY freq DESC, o_custkey ASC) AS f,
        |    ntile(5) OVER (ORDER BY mon_cents DESC, o_custkey ASC) AS m
        |  FROM c)
        |SELECT r, f, m, count(*) AS customers,
        |  CAST(min(rec_days) AS BIGINT) AS min_rec,
        |  CAST(max(rec_days) AS BIGINT) AS max_rec,
        |  round(avg(freq), 4) AS avg_freq,
        |  round(avg(mon_cents), 0) / 100 AS avg_monetary
        |FROM s GROUP BY r, f, m
        |HAVING count(*) >= 5
        |ORDER BY r ASC, f ASC, m ASC""".stripMargin,
    "seq_markov" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
        |      FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(c.n / CAST(t.row_n AS DOUBLE), 6) AS p
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type ASC, c.to_type ASC""".stripMargin,
    "funnel_latency" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id),
        |lat AS (
        |  SELECT epoch_us(t_purchase) - epoch_us(t_view) AS lat_us
        |  FROM u WHERE t_view IS NOT NULL AND t_purchase > t_view)
        |SELECT count(*) AS conversions,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY lat_us) AS p25_us,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY lat_us) AS p50_us,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY lat_us) AS p90_us,
        |  round(avg(lat_us), 2) AS avg_us
        |FROM lat""".stripMargin,
    "hist_kde" ->
      """WITH bins AS (
        |  SELECT CAST(floor(o_totalprice / 5000.0) AS BIGINT) AS b, count(*) AS cnt
        |  FROM orders GROUP BY b),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM bins),
        |pts AS (SELECT CAST(unnest(generate_series(0, 20)) AS BIGINT) * 25000 AS x),
        |terms AS (
        |  SELECT pts.x, tot.n,
        |    bins.cnt * exp(((pts.x - (bins.b * 5000 + 2500)) / 20000.0)
        |      * ((pts.x - (bins.b * 5000 + 2500)) / 20000.0) / -2.0) AS term
        |  FROM pts CROSS JOIN bins CROSS JOIN tot)
        |SELECT x, max(n) AS n,
        |  round(1e6 * sum(term) / (max(n) * 20000.0 * sqrt(2.0 * pi())), 6) AS density_ppm
        |FROM terms GROUP BY x ORDER BY x ASC""".stripMargin,
    "interval_coverage" ->
      """WITH base AS (
        |  SELECT l_suppkey AS suppkey,
        |    date_diff('day', DATE '1970-01-01', date_trunc('day', l_shipdate)) AS sd,
        |    date_diff('day', DATE '1970-01-01', date_trunc('day', l_shipdate))
        |      + CAST(l_quantity AS BIGINT) AS ed
        |  FROM lineitem),
        |sweep AS (
        |  SELECT suppkey, sd, ed,
        |    max(ed) OVER (PARTITION BY suppkey ORDER BY sd ASC, ed ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_ed
        |  FROM base),
        |op AS (
        |  SELECT *, CASE WHEN prev_max_ed IS NULL OR sd > prev_max_ed
        |    THEN 1 ELSE 0 END AS opener
        |  FROM sweep),
        |isl AS (
        |  SELECT suppkey, sd, ed,
        |    sum(opener) OVER (PARTITION BY suppkey ORDER BY sd ASC, ed ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM op),
        |g AS (
        |  SELECT suppkey, island, count(*) AS lines,
        |    min(sd) AS isl_start, max(ed) AS isl_end
        |  FROM isl GROUP BY suppkey, island)
        |SELECT suppkey, CAST(sum(lines) AS BIGINT) AS n_lines, count(*) AS islands,
        |  CAST(sum(isl_end - isl_start) AS BIGINT) AS covered_days,
        |  max(isl_end) - min(isl_start) AS span_days
        |FROM g GROUP BY suppkey ORDER BY suppkey ASC""".stripMargin,
    "seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS n_events,
        |    string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END, ''
        |      ORDER BY ts ASC, event_id ASC) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(regexp_matches(seq, 'v[^e]*c[^e]*p') AS INTEGER) AS matched
        |FROM s ORDER BY user_id ASC""".stripMargin,
    "sess_batch" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM l),
        |g AS (
        |  SELECT *, sum(new_sess) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS sess_n
        |  FROM s)
        |SELECT user_id, CAST(sess_n AS BIGINT) AS sess_n, count(*) AS n_events,
        |  max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us,
        |  round(sum(value), 6) AS total_value
        |FROM g GROUP BY user_id, sess_n
        |ORDER BY user_id ASC, sess_n ASC""".stripMargin,
    "hist_eqdepth" ->
      """WITH c AS (
        |  SELECT
        |    percentile_disc(0.1) WITHIN GROUP (ORDER BY o_totalprice) AS c1,
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY o_totalprice) AS c2,
        |    percentile_disc(0.3) WITHIN GROUP (ORDER BY o_totalprice) AS c3,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY o_totalprice) AS c4,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS c5,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY o_totalprice) AS c6,
        |    percentile_disc(0.7) WITHIN GROUP (ORDER BY o_totalprice) AS c7,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY o_totalprice) AS c8,
        |    percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS c9
        |  FROM orders),
        |b AS (
        |  SELECT o_totalprice,
        |    CAST(o_totalprice > c1 AS INT) + CAST(o_totalprice > c2 AS INT) +
        |    CAST(o_totalprice > c3 AS INT) + CAST(o_totalprice > c4 AS INT) +
        |    CAST(o_totalprice > c5 AS INT) + CAST(o_totalprice > c6 AS INT) +
        |    CAST(o_totalprice > c7 AS INT) + CAST(o_totalprice > c8 AS INT) +
        |    CAST(o_totalprice > c9 AS INT) AS bucket
        |  FROM orders CROSS JOIN c)
        |SELECT bucket, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo_seen,
        |  round(max(o_totalprice), 2) AS hi_seen
        |FROM b GROUP BY bucket ORDER BY bucket ASC""".stripMargin,
    "hist_equiwidth" ->
      """SELECT CAST(least(9, floor(o_totalprice / 50000)) AS INT) AS bucket,
        |  count(*) AS n,
        |  round(sum(o_totalprice), 2) AS rev,
        |  round(min(o_totalprice), 2) AS lo_seen,
        |  round(max(o_totalprice), 2) AS hi_seen,
        |  CAST(CAST(least(9, floor(o_totalprice / 50000)) AS INT) * 50000 AS DOUBLE) AS lo
        |FROM orders
        |GROUP BY bucket ORDER BY bucket ASC""".stripMargin,
    "funnel_steps" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS users, count(t_view) AS viewed,
        |  count(*) FILTER (WHERE t_click > t_view) AS clicked_after_view,
        |  count(*) FILTER (WHERE t_click > t_view AND t_purchase > t_click) AS purchased_after_click
        |FROM u""".stripMargin,
    "funnel_retention" ->
      """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS c_day FROM ev GROUP BY user_id),
        |per_user AS (
        |  SELECT ev.user_id, c_day,
        |    max(CASE WHEN date_diff('day', c_day, day) BETWEEN 7 AND 13 THEN 1 ELSE 0 END) AS retained_w2
        |  FROM ev JOIN cohort ON ev.user_id = cohort.user_id
        |  GROUP BY ev.user_id, c_day)
        |SELECT c_day, count(*) AS cohort_users, CAST(sum(retained_w2) AS BIGINT) AS retained
        |FROM per_user GROUP BY c_day ORDER BY c_day ASC""".stripMargin)
}
