package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventPattern
import graft.operators.EventPattern.{QStage, quantified}

/** seq_nfa_quant (round 12, VERDICT r11 task 3): quantified stage chains
  * — optional stages (B?) and bounded repetition (B{1,2}) compiled into
  * the same flat DFA the fixed-chain runner executes.
  *
  * The compiler (`quantified`) is pinned three ways: hand-derived truth
  * on the quantifier edge cases no run-compression can express (a second
  * click killing click{0,1}); a 500-stream randomized comparison against
  * an INDEPENDENT hand-written transition table for the declared
  * pattern; and distributed == scalar == incremental equivalence. The
  * DuckDB side is covered by the declared query's recursive-CTE
  * automaton-emulation oracle (driver-hashed at 3 SFs).
  */
class EventPatternQuantSpec extends AnyFunSuite {
  import TestSpark._

  // the declared pattern: view+ click? purchase+
  private val vcpQ = quantified(Seq(
    QStage("v", 1, QStage.Inf), QStage("c", 0, 1), QStage("p", 1, QStage.Inf)))
  private def count(nfa: EventPattern.NfaSpec)(s: String): Long =
    EventPattern.matchCount(s.split(" ").iterator.filter(_.nonEmpty), nfa)

  test("optional stage: v+ c? p+ hand cases") {
    val n = count(vcpQ) _
    assert(n("v c p") == 1)
    assert(n("v p") == 1)           // click skipped entirely
    assert(n("v v p p") == 1)       // accept at FIRST p, trailing p's dead
    assert(n("v c c p") == 0)       // SECOND click abandons the attempt
    assert(n("v c v p") == 1)       // failed attempt, then v p succeeds
    assert(n("c p") == 0)           // view is required
    assert(n("v p v c p") == 2)
    assert(n("v c p v c c p v p") == 2) // middle attempt dies on cc
    assert(n("x v c x p") == 0)     // stranger symbol restarts
    assert(n("") == 0)
  }

  test("bounded repetition: a+ b{1,2} c+ hand cases") {
    val nfa = quantified(Seq(
      QStage("a", 1, QStage.Inf), QStage("b", 1, 2), QStage("c", 1, QStage.Inf)))
    val n = count(nfa) _
    assert(n("a b c") == 1)
    assert(n("a b b c") == 1)       // two b's allowed
    assert(n("a b b b c") == 0)     // three b's overflow {1,2}
    assert(n("a c") == 0)           // b required here
    assert(n("a a b b c c a b c") == 2)
  }

  test("required minimum: a{2,3} c+ hand cases") {
    val nfa = quantified(Seq(QStage("a", 2, 3), QStage("c", 1, QStage.Inf)))
    val n = count(nfa) _
    assert(n("a c") == 0)           // one a below min 2
    assert(n("a a c") == 1)
    assert(n("a a a c") == 1)
    assert(n("a a a a c") == 0)     // a4 overflows max 3, restart at a4
                                    // leaves only ONE a of context before c
    assert(n("a a a a a c") == 1)   // restart at a4, a5 re-reaches min 2
  }

  test("required minimum: restart re-accumulates from the failing symbol") {
    // a{2,2} c+ on "a a a c": a3 overflows max ⇒ restart AT a3 (the
    // failing symbol opens a fresh attempt, the runner's δ(0,·)
    // fallback), so a3 counts as rep 1 and c completes nothing — but
    // on "a a a a c" the restart at a3 plus a4 reaches min 2 again
    val nfa = quantified(Seq(QStage("a", 2, 2), QStage("c", 1, QStage.Inf)))
    val n = count(nfa) _
    assert(n("a a c") == 1)
    assert(n("a a a c") == 0)
    assert(n("a a a a c") == 1)
  }

  test("500 random streams: compiled DFA == independent hand transition table") {
    // hand-written δ for v+ c? p+, derived from the semantics directly
    // (NOT from the compiler): states 0 start, 1 in-views, 2 one-click,
    // 3 accept
    def handStep(state: Int, sym: String): Int = (state, sym) match {
      case (1, "v") => 1
      case (1, "c") => 2
      case (1, "p") => 3
      case (2, "p") => 3
      case (_, "v") => 1 // restart fallback δ(0,·)
      case _        => 0
    }
    def handCount(syms: Seq[String]): Long = {
      var s = 0; var m = 0L
      syms.foreach { x =>
        s = handStep(s, x)
        if (s == 3) { m += 1; s = 0 }
      }
      m
    }
    val rnd = new scala.util.Random(1912)
    val alpha = Vector("v", "c", "p", "x", "s")
    (1 to 500).foreach { _ =>
      val syms = Vector.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.size)))
      val got = EventPattern.matchCount(syms.iterator, vcpQ)
      assert(got == handCount(syms), s"stream=${syms.mkString}")
    }
  }

  test("declared query == scalar replay over collected per-user streams at sf0.001") {
    val nfa = quantified(Seq(
      QStage("view", 1, QStage.Inf), QStage("click", 0, 1),
      QStage("purchase", 1, QStage.Inf)))
    val got = EventPattern.seqNfaQuant(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Tables.events(spark, sf0001)
      .select(col("user_id"),
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
          .as("evs"))
      .dropDuplicates("user_id")
      .collect()
      .map { r =>
        val syms = r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(2))
        r.getLong(0) -> EventPattern.matchCount(syms.iterator, nfa)
      }.filter(_._2 > 0).toMap
    assert(got == expect)
    assert(got.nonEmpty, "fixture must exercise the pattern")
  }

  test("partition invariance: 1 vs 32 partitions produce identical results") {
    val a = EventPattern.seqNfaQuant(spark, sf0001).collect().toSeq
    val b = EventPattern.seqNfaQuant(spark, sf0001).repartition(1).collect()
      .sortBy(_.getLong(0)).toSeq
    assert(a.sortBy(_.getLong(0)) == b)
  }

  test("seq_nfa_pred: declared query == scalar replay with refined symbols at sf0.001") {
    val nfa = quantified(Seq(
      QStage("view", 1, QStage.Inf), QStage("click", 0, 1),
      QStage("purchase", 1, QStage.Inf)))
    val thr = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)"))
      .head().getDouble(0)
    val got = EventPattern.seqNfaPred(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Tables.events(spark, sf0001)
      .select(col("user_id"),
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type"), col("value"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
          .as("evs"))
      .dropDuplicates("user_id")
      .collect()
      .map { r =>
        val syms = r.getSeq[org.apache.spark.sql.Row](1).map { e =>
          val t = e.getString(2)
          if (t == "purchase" && !(e.getDouble(3) > thr)) "purchase_lo" else t
        }
        r.getLong(0) -> EventPattern.matchCount(syms.iterator, nfa)
      }.filter(_._2 > 0).toMap
    assert(got == expect)
    assert(got.nonEmpty, "fixture must exercise the guarded pattern")
    // the guard must BITE: strictly fewer matching users than the
    // unguarded quantified pattern (p90 filters ~90% of purchases)
    val unguarded = EventPattern.seqNfaQuant(spark, sf0001).count()
    assert(got.size < unguarded,
      s"guard must reduce matches (guarded=${got.size} unguarded=$unguarded)")
  }

  test("seq_nfa_pred guard refinement: strict > excludes the threshold datum") {
    import spark.implicits._
    // mirrors the refinement expression in seqNfaPred verbatim: an event
    // AT the percentile_disc datum must refine to the dead symbol in BOTH
    // engines (the oracle uses the same strict >), so ties can never
    // diverge
    val df = Seq(("purchase", 10.0), ("purchase", 10.0000001),
      ("purchase", 9.99), ("view", 999.0)).toDF("event_type", "value")
    val got = df.withColumn("p90", lit(10.0))
      .select(when(col("event_type") === "purchase" && !(col("value") > col("p90")),
        lit("purchase_lo")).otherwise(col("event_type")).as("sym"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("purchase_lo", "purchase", "purchase_lo", "view"))
  }

  test("compiler guards: duplicate symbols / optional final stage rejected") {
    intercept[IllegalArgumentException] {
      quantified(Seq(QStage("a", 1, 1), QStage("a", 1, 1)))
    }
    intercept[IllegalArgumentException] {
      quantified(Seq(QStage("a", 1, 1), QStage("b", 0, 1)))
    }
    intercept[IllegalArgumentException] {
      quantified(Seq(QStage("a", 3, 2)))
    }
  }
}
