package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{UserEventRow => Ev}

/** SURVEY.md §2.I addendum (round 11, VERDICT r10 "what's missing" #1) —
  * GENERAL event-pattern matching, the MATCH_RECOGNIZE-class operator:
  * `seq_pattern` answers one fixed funnel regex over a collected per-user
  * string; this operator runs an arbitrary finite automaton over each
  * user's time-ordered event stream and counts greedy non-overlapping
  * matches. A user with a different pattern supplies a different
  * `NfaSpec` (or builds one from `NfaSpec.stages`) — no operator rewrite.
  *
  * Execution is the secondary-sort idiom (ScaleIdioms.secSortPath's
  * shape): hash-repartition by user_id (high cardinality ⇒ even spread),
  * sort within partitions by (user, ts, event_id), then ONE streaming
  * pass that advances the automaton O(1) per event with O(|states|)
  * memory — no per-user collect_list, no window frame, no second
  * shuffle. At 100 TB this is the canonical distributed MATCH_RECOGNIZE
  * plan: state per task is one integer per in-flight user, the sort is
  * Spark's spillable external sorter, and the only wire cost is the one
  * user-key exchange.
  *
  * Match semantics (the deterministic subset every SQL MATCH_RECOGNIZE
  * implementation defaults to): scan left to right; on each event take
  * the transition δ(state, symbol); if none exists, restart at
  * δ(start, symbol) (the current event may open a new match); entering
  * the accept state counts a match and resets to start — greedy,
  * non-overlapping, skip-past-match.
  *
  * KNOWN RESTRICTION vs SQL-standard AFTER MATCH SKIP TO NEXT ROW
  * (ADVICE r12, pinned in EventPatternQuantSpec): mismatch recovery is
  * the ONE-SYMBOL restart δ(0, symbol) — the scan never re-reads events
  * before the current one. Patterns whose failed attempt consumes events
  * that a later successful match would need (multi-symbol lookbehind)
  * therefore miss matches a skip-to-next-row engine finds: a{2,2} c+ on
  * the stream `a a a c` counts 0 here (the first two a's satisfy a{2,2},
  * the third a kills the attempt, and the restart opens at the c), while
  * SKIP TO NEXT ROW retries from event 2 and matches events 2-4. Engine,
  * incremental form, and oracle all share the restart semantics, so
  * results are internally consistent; the divergence only matters when
  * comparing against an external MATCH_RECOGNIZE implementation, and it
  * requires a bounded repetition with min ≥ 2 (the a{2,2} shape) — the
  * declared instances use only `+` / `?` quantifiers over distinct
  * symbols, where no diverging case is known or pinned.
  *
  * §2.Z determinism: the scan order (ts, event_id) is a total order; the
  * automaton is a function, so match counts are partition-layout-
  * independent (pinned in EventPatternSpec). The declared query's
  * automaton is `stages(view, click, purchase)` = the regex
  * view+ click+ purchase, whose match count equals the count of
  * consecutive maximal-run triples (view*, click*, purchase*) — the
  * gaps-and-islands form the DuckDB oracle computes. */
object EventPattern {

  /** A deterministic automaton: δ as a (state, symbol) map, one accept
    * state. States are small ints; `start` is 0 by convention. */
  final case class NfaSpec(accept: Int, delta: Map[(Int, String), Int]) {
    /** δ with restart semantics; accept handled by the runner. */
    def step(state: Int, sym: String): Int =
      delta.getOrElse((state, sym), delta.getOrElse((0, sym), 0))
  }

  object NfaSpec {
    /** The one-or-more stage chain A+ B+ C+ … — the funnel-family
      * pattern: state i = "inside stage i's run". From state i the
      * current stage's symbol loops, the next stage's symbol advances,
      * any other symbol restarts (possibly straight into stage 1). */
    def stages(syms: Seq[String]): NfaSpec = {
      require(syms.nonEmpty && syms.distinct == syms,
        "stage symbols must be distinct")
      val n = syms.size
      val loops = syms.zipWithIndex.map { case (s, i) => (i + 1, s) -> (i + 1) }
      val advances = syms.zipWithIndex.drop(1).map { case (s, i) => (i, s) -> (i + 1) }
      val starts = Seq((0, syms.head) -> 1)
      NfaSpec(n, (loops ++ advances ++ starts).toMap)
    }
  }

  /** A QUANTIFIED stage: `sym` must appear between `min` and `max` times
    * consecutively (max = Int.MaxValue for unbounded `+`/`*`). The
    * MATCH_RECOGNIZE quantifier vocabulary — A+ is (A,1,∞), B? is
    * (B,0,1), C{1,2} is (C,1,2). */
  final case class QStage(sym: String, min: Int, max: Int)

  object QStage {
    val Inf: Int = Int.MaxValue
  }

  /** Compile a quantified stage chain (round 12, VERDICT r11 task 3 —
    * the optional/bounded-repetition extension of `NfaSpec.stages`) into
    * the same flat DFA the runner already executes: nothing downstream
    * changes — batch secondary-sort pass, mapGroupsWithState increment,
    * two-longs-per-user state all stay identical, the quantifiers exist
    * only as extra (stage, repcount) states in δ.
    *
    * State = (stage i, consecutive reps r). Same-symbol transitions
    * advance r while r < max (unbounded stages loop at min(r+1, min∨1));
    * next-stage transitions exist from any r ≥ min_i to every following
    * stage reachable by skipping min=0 stages only; start transitions
    * mirror that from state 0. Accept = the moment every stage's minimum
    * CAN be satisfied = entering (last stage, min_last) — the same
    * greedy-minimal accept the fixed chain uses (A+ B+ C+ accepts at
    * the FIRST c); reset-at-accept is the runner's job, as before.
    * Mismatches restart via the runner's δ(0, sym) fallback, so a
    * second click against click{0,1} correctly abandons the match (an
    * event-grain semantics a run/gaps-and-islands oracle CANNOT express
    * — the oracle below emulates the automaton itself instead).
    * Requires distinct symbols and a required (min ≥ 1) final stage so
    * the accept state is unique. */
  def quantified(stages: Seq[QStage]): NfaSpec = {
    require(stages.nonEmpty && stages.map(_.sym).distinct.size == stages.size,
      "stage symbols must be distinct")
    require(stages.forall(s => s.min >= 0 && s.max >= 1 && s.min <= s.max),
      "need 0 <= min <= max, max >= 1")
    require(stages.last.min >= 1, "final stage must be required (min >= 1)")
    val n = stages.size
    def cap(i: Int): Int = { // highest rep count that needs its own state
      val s = stages(i - 1)
      if (s.max == QStage.Inf) math.max(s.min, 1) else s.max
    }
    // state ids: 0 = start; (i, r) enumerated stage-major
    val ids: Map[(Int, Int), Int] = {
      var next = 1
      (1 to n).flatMap { i => (1 to cap(i)).map { r =>
        val e = (i, r) -> next; next += 1; e
      } }.toMap
    }
    val delta = scala.collection.mutable.Map.empty[(Int, String), Int]
    // start transitions: stage j is openable while every earlier stage
    // is optional
    var j = 1
    var open = true
    while (open && j <= n) {
      delta((0, stages(j - 1).sym)) = ids((j, 1))
      open = stages(j - 1).min == 0
      j += 1
    }
    for (i <- 1 to n; r <- 1 to cap(i)) {
      val st = stages(i - 1)
      val from = ids((i, r))
      // same symbol: advance the rep count (unbounded stages saturate)
      if (st.max == QStage.Inf) delta((from, st.sym)) = ids((i, math.min(r + 1, cap(i))))
      else if (r < st.max) delta((from, st.sym)) = ids((i, r + 1))
      // (else: bounded stage at max — no entry; runner restarts via δ(0,·))
      // next stages: openable once this stage's min is met, skipping
      // optional stages only
      if (r >= st.min) {
        var k = i + 1
        var reach = true
        while (reach && k <= n) {
          delta((from, stages(k - 1).sym)) = ids((k, 1))
          reach = stages(k - 1).min == 0
          k += 1
        }
      }
    }
    NfaSpec(ids((n, math.max(stages.last.min, 1))), delta.toMap)
  }

  /** Count greedy non-overlapping matches over one user's ordered
    * symbols. */
  private[graft] def matchCount(syms: Iterator[String], nfa: NfaSpec): Long = {
    var state = 0
    var matches = 0L
    while (syms.hasNext) {
      state = nfa.step(state, syms.next())
      if (state == nfa.accept) { matches += 1; state = 0 }
    }
    matches
  }

  /** General form: match `nfa` over every user's event stream; emit
    * (user_id, n_matches) for users with at least one match. */
  def matchUsers(spark: SparkSession, dir: String, nfa: NfaSpec): DataFrame =
    matchUsersOf(
      Tables.events(spark, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tsus"),
          col("event_id"), col("event_type")),
      nfa)

  /** Same runner over a caller-supplied (user_id, tsus, event_id,
    * event_type) frame — the seam that makes PREDICATE-guarded stages a
    * symbol-refinement concern (round 13): a guard like purchase(value >
    * p90) rewrites the SYMBOL map-side before the one user-key exchange,
    * and the automaton/plan stay byte-identical. */
  private[graft] def matchUsersOf(events: DataFrame, nfa: NfaSpec): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val sorted = events
      // width-less keyed repartition: the exchange takes the session's
      // spark.sql.shuffle.partitions (32 locally, cluster-sized on a real
      // deployment) — a literal 32 here would cap a 1000-executor run at
      // 32 tasks (round 13; results are partition-invariant, pinned)
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tsus"), col("event_id"))
    sorted.as[Ev]
      .mapPartitions { rows =>
        val in = rows.buffered
        new Iterator[(Long, Long)] {
          def hasNext: Boolean = in.hasNext
          def next(): (Long, Long) = {
            val u = in.head.user_id
            var state = 0
            var matches = 0L
            while (in.hasNext && in.head.user_id == u) {
              state = nfa.step(state, in.next().event_type)
              if (state == nfa.accept) { matches += 1; state = 0 }
            }
            (u, matches)
          }
        }
      }
      .toDF("user_id", "n_matches")
      .filter(col("n_matches") > 0)
      .orderBy(col("user_id").asc)
  }

  /** Declared instance: the view+ click+ purchase funnel automaton. */
  def seqNfa(spark: SparkSession, dir: String): DataFrame =
    matchUsers(spark, dir, NfaSpec.stages(Seq("view", "click", "purchase")))

  /** The declared QUANTIFIED instance (round 12): view+ click? purchase+
    * — the "funnel with an optional consideration step" every product
    * team asks for next: a user may go straight view→purchase, and AT
    * MOST ONE click is tolerated in between (a second click abandons
    * the attempt — event-grain semantics no run-compression oracle can
    * express, so the oracle emulates δ itself; see oracleSql). Same
    * runner, same plan; the quantifiers live entirely in δ. */
  def seqNfaQuant(spark: SparkSession, dir: String): DataFrame =
    matchUsers(spark, dir, quantified(Seq(
      QStage("view", 1, QStage.Inf),
      QStage("click", 0, 1),
      QStage("purchase", 1, QStage.Inf))))

  /** PREDICATE-GUARDED stage (round 13, VERDICT r12 task 6 / named gap
    * 3): view+ click? purchase(value > p90)+ — the MATCH_RECOGNIZE
    * DEFINE-clause idiom where a stage matches only events satisfying a
    * value predicate. Implemented as SYMBOL REFINEMENT, which is how a
    * DFA expresses guards over a finite predicate partition: the p90
    * threshold over purchase values (percentile_disc — an ACTUAL datum,
    * so the strict `>` comparison is tie-exact in both engines) is
    * computed in one small column-pruned agg and broadcast; each event's
    * symbol is rewritten map-side (`purchase` stays `purchase` only when
    * value > p90, else becomes the dead symbol `purchase_lo`, which has
    * no transition anywhere ⇒ the runner's δ(0,·) restart abandons the
    * attempt — a low-value purchase mid-pattern kills the match, exactly
    * MATCH_RECOGNIZE's failed-DEFINE semantics under our skip rule).
    * Runner, incremental form, per-user state, and plan are unchanged;
    * the guard costs one broadcast-scalar join before the same single
    * user-key exchange. Oracle: the seq_nfa_quant δ-emulation CTE with
    * the refined symbol computed in its ev CTE. Incremental equivalence
    * (same refinement fed to matchCountsIncremental) is pinned in
    * StreamingEquivalenceSpec. */
  def seqNfaPred(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val thr = ev.filter(col("event_type") === "purchase")
      .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"))
    matchUsersOf(
      ev.crossJoin(broadcast(thr))
        .select(col("user_id"), unix_micros(col("ts")).as("tsus"), col("event_id"),
          // 3-valued logic pinned DOWN: a NULL value (or a NULL threshold
          // from an all-null purchase column) FAILS the guard — SQL
          // MATCH_RECOGNIZE DEFINE semantics, where a predicate that is
          // not TRUE does not match. Without the coalesce, NULL > p90 is
          // NULL, !(NULL) is NULL, and when() would fall through to the
          // live 'purchase' symbol — silently PASSING the guard instead.
          when(col("event_type") === "purchase" &&
              !coalesce(col("value") > col("p90"), lit(false)),
            lit("purchase_lo"))
            .otherwise(col("event_type")).as("event_type")),
      quantified(Seq(
        QStage("view", 1, QStage.Inf),
        QStage("click", 0, 1),
        QStage("purchase", 1, QStage.Inf))))
  }

  /** Per-user NFA progress carried across micro-batches: the ENTIRE
    * streaming state of a MATCH_RECOGNIZE run is one automaton state +
    * one counter. */
  final case class NfaProgress(state: Int, matches: Long)

  /** INCREMENTAL form of `matchUsers` — the same automaton advanced
    * under `mapGroupsWithState`: within a micro-batch the group's
    * events sort in memory by (ts, event_id) (the Sessionize pattern);
    * across batches the carried NfaProgress resumes exactly where the
    * previous batch stopped, so time-ordered micro-batches reproduce
    * the batch answer — StreamingEquivalenceSpec pins that. This is the
    * batch/stream unification story for the pattern family: per-user
    * state is TWO LONGS regardless of history length, the cheapest
    * state-store shape Structured Streaming can carry at 100 TB/day
    * event volumes. Emitted counts are monotone per user; consumers in
    * update mode keep the max. */
  def matchCountsIncremental(ds: org.apache.spark.sql.Dataset[graft.streaming.GEvent],
      nfa: NfaSpec): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[NfaProgress, (Long, Long)](GroupStateTimeout.NoTimeout()) {
        (user, evs, gs) =>
          // MICROsecond sort key (ADVICE r11): the batch path orders by
          // unix_micros(ts); getTime alone is millis, so events distinct
          // at µs grain could tie here and fall back to event_id order,
          // diverging from the batch automaton this method must replay.
          // Shared with Sessionize (round 13): floorDiv, not truncation,
          // so pre-epoch timestamps keep their order too.
          val sorted = evs.toIndexedSeq.sortBy(e =>
            (graft.streaming.Sessionize.microsOf(e.ts), e.event_id))
          val prev = gs.getOption.getOrElse(NfaProgress(0, 0L))
          var s = prev.state
          var m = prev.matches
          sorted.foreach { e =>
            s = nfa.step(s, e.event_type)
            if (s == nfa.accept) { m += 1; s = 0 }
          }
          gs.update(NfaProgress(s, m))
          (user, m)
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "seq_nfa" -> (seqNfa _),
    "seq_nfa_quant" -> (seqNfaQuant _),
    "seq_nfa_pred" -> (seqNfaPred _))

  val oracleSql: Map[String, String] = Map(
    // gaps-and-islands runs per user, then count run triples
    // (view, click, purchase) — exactly the automaton's greedy
    // non-overlapping matches for a distinct-alphabet stage chain
    "seq_nfa" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER w AS rn,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |r AS (
        |  SELECT user_id, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS run_id
        |  FROM e),
        |runs AS (
        |  SELECT user_id, run_id, min(event_type) AS t
        |  FROM r GROUP BY user_id, run_id),
        |m AS (
        |  SELECT user_id,
        |    CASE WHEN t = 'view' AND lead(t, 1) OVER w2 = 'click'
        |           AND lead(t, 2) OVER w2 = 'purchase'
        |      THEN 1 ELSE 0 END AS hit
        |  FROM runs
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id ASC))
        |SELECT user_id, CAST(sum(hit) AS BIGINT) AS n_matches
        |FROM m GROUP BY user_id HAVING sum(hit) > 0
        |ORDER BY user_id ASC""".stripMargin,
    // run-grammar EMULATION oracle (VERDICT r11 task 3): the quantified
    // pattern's semantics are event-grain (click{0,1} dies on a SECOND
    // click), so no run/gaps-and-islands form exists — instead the
    // recursive CTE advances the compiled DFA itself, one event per
    // step per user, with δ rendered literally:
    //   δ(1,view)=1 δ(1,click)=2 δ(1,purchase)=3 δ(2,purchase)=3,
    //   restart fallback δ(0,view)=1 else 0, accept=3 ⇒ count & reset.
    // The recursion's working set is one row per still-active user;
    // depth = that user's event count. matches is nondecreasing, so the
    // final count is max(matches) over all levels.
    "seq_nfa_quant" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |scan AS (
        |  SELECT user_id, 0 AS rn, 0 AS state, 0 AS matches
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT s.user_id, e.rn,
        |    CASE WHEN (CASE
        |        WHEN s.state = 1 AND e.event_type = 'view' THEN 1
        |        WHEN s.state = 1 AND e.event_type = 'click' THEN 2
        |        WHEN s.state = 1 AND e.event_type = 'purchase' THEN 3
        |        WHEN s.state = 2 AND e.event_type = 'purchase' THEN 3
        |        WHEN e.event_type = 'view' THEN 1 ELSE 0 END) = 3
        |      THEN 0 ELSE (CASE
        |        WHEN s.state = 1 AND e.event_type = 'view' THEN 1
        |        WHEN s.state = 1 AND e.event_type = 'click' THEN 2
        |        WHEN s.state = 1 AND e.event_type = 'purchase' THEN 3
        |        WHEN s.state = 2 AND e.event_type = 'purchase' THEN 3
        |        WHEN e.event_type = 'view' THEN 1 ELSE 0 END) END AS state,
        |    s.matches + CASE WHEN (CASE
        |        WHEN s.state = 1 AND e.event_type = 'view' THEN 1
        |        WHEN s.state = 1 AND e.event_type = 'click' THEN 2
        |        WHEN s.state = 1 AND e.event_type = 'purchase' THEN 3
        |        WHEN s.state = 2 AND e.event_type = 'purchase' THEN 3
        |        WHEN e.event_type = 'view' THEN 1 ELSE 0 END) = 3
        |      THEN 1 ELSE 0 END AS matches
        |  FROM scan s
        |  JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, CAST(max(matches) AS BIGINT) AS n_matches
        |FROM scan GROUP BY user_id HAVING max(matches) > 0
        |ORDER BY user_id ASC""".stripMargin,
    // the same δ-emulation, over the REFINED alphabet: a purchase whose
    // value fails the p90 guard is renamed to the dead symbol
    // purchase_lo inside the ev CTE (quantile_disc returns an actual
    // datum ↔ Spark's percentile_disc, so the strict > is tie-exact);
    // δ itself is unchanged — purchase_lo hits no CASE arm and the
    // ELSE 0 restart abandons the attempt, mirroring the runner
    "seq_nfa_pred" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'purchase' AND NOT COALESCE(value >
        |        (SELECT quantile_disc(value, 0.9) FROM events
        |         WHERE event_type = 'purchase'), FALSE)
        |      THEN 'purchase_lo' ELSE event_type END AS event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events),
        |scan AS (
        |  SELECT user_id, 0 AS rn, 0 AS state, 0 AS matches
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT s.user_id, e.rn,
        |    CASE WHEN (CASE
        |        WHEN s.state = 1 AND e.event_type = 'view' THEN 1
        |        WHEN s.state = 1 AND e.event_type = 'click' THEN 2
        |        WHEN s.state = 1 AND e.event_type = 'purchase' THEN 3
        |        WHEN s.state = 2 AND e.event_type = 'purchase' THEN 3
        |        WHEN e.event_type = 'view' THEN 1 ELSE 0 END) = 3
        |      THEN 0 ELSE (CASE
        |        WHEN s.state = 1 AND e.event_type = 'view' THEN 1
        |        WHEN s.state = 1 AND e.event_type = 'click' THEN 2
        |        WHEN s.state = 1 AND e.event_type = 'purchase' THEN 3
        |        WHEN s.state = 2 AND e.event_type = 'purchase' THEN 3
        |        WHEN e.event_type = 'view' THEN 1 ELSE 0 END) END AS state,
        |    s.matches + CASE WHEN (CASE
        |        WHEN s.state = 1 AND e.event_type = 'view' THEN 1
        |        WHEN s.state = 1 AND e.event_type = 'click' THEN 2
        |        WHEN s.state = 1 AND e.event_type = 'purchase' THEN 3
        |        WHEN s.state = 2 AND e.event_type = 'purchase' THEN 3
        |        WHEN e.event_type = 'view' THEN 1 ELSE 0 END) = 3
        |      THEN 1 ELSE 0 END AS matches
        |  FROM scan s
        |  JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, CAST(max(matches) AS BIGINT) AS n_matches
        |FROM scan GROUP BY user_id HAVING max(matches) > 0
        |ORDER BY user_id ASC""".stripMargin)
}
