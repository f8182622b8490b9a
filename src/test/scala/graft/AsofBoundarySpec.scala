package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{AsofJoin, IntervalJoin}

/** Round-12 crafted sweep #2 (VERDICT r11 task 7): tie/boundary
  * semantics of the native as-of and interval physical operators under
  * DUPLICATE timestamps — the input class the fixtures (distinct event
  * micro-timestamps) never produce. Reference answers come from the
  * declarative max_by / theta-join formulations the operators promise to
  * reproduce, evaluated on the same crafted frames.
  */
class AsofBoundarySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- as-of: right rows (user, ts, tie); left rows (user, ts, lid) ----

  private def asofRef(left: DataFrame, right: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    left.join(right,
        left("u") === right("ru") && right("rts") <= left("ts"))
      .groupBy(left("u").as("u"), left("ts").as("ts"), left("lid").as("lid"))
      .agg(max(struct(col("rts"), col("tie"))).as("m"))
      .select(col("u"), col("ts"), col("lid"), col("m.rts"), col("m.tie"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def asofNative(left: DataFrame, right: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    AsofJoin.asof(left, right, "u", "ts", "ru", "rts", "tie")
      .select(col("u"), col("ts"), col("lid"), col("rts"), col("tie"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("as-of boundary: right ts == left ts is INCLUDED; duplicate right ts resolve by max tie") {
    val left = Seq((1L, 100L, 10L), (1L, 100L, 11L), (1L, 99L, 12L))
      .toDF("u", "ts", "lid")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L), (1L, 50L, 1L))
      .toDF("ru", "rts", "tie")
    val got = asofNative(left, right)
    assert(got == asofRef(left, right))
    // boundary ts=100 rows take the (100, max tie 9) match; the ts=99 row
    // falls back to (50, 1)
    assert(got == Set(
      (1L, 100L, 10L, 100L, 9L), (1L, 100L, 11L, 100L, 9L), (1L, 99L, 12L, 50L, 1L)))
  }

  test("as-of inner semantics: match-less left rows and left-less right users vanish") {
    val left = Seq((1L, 10L, 1L), (2L, 10L, 2L)).toDF("u", "ts", "lid")
    val right = Seq((1L, 20L, 5L), (3L, 5L, 6L)).toDF("ru", "rts", "tie")
    // user 1: only future right rows ⇒ dropped; user 2: no right rows ⇒
    // dropped; user 3: right-only ⇒ nothing
    assert(asofNative(left, right).isEmpty)
    assert(asofRef(left, right).isEmpty)
  }

  test("as-of: a stale match from an earlier user never leaks into the next user") {
    val left = Seq((1L, 100L, 1L), (2L, 100L, 2L)).toDF("u", "ts", "lid")
    val right = Seq((1L, 50L, 5L)).toDF("ru", "rts", "tie")
    val got = asofNative(left, right)
    assert(got == Set((1L, 100L, 1L, 50L, 5L)), s"user 2 must not inherit user 1's match: $got")
  }

  test("as-of: native == max_by reference on 300-row random frames with heavy ts ties") {
    val rnd = new scala.util.Random(812)
    (1 to 10).foreach { _ =>
      // ts drawn from a tiny domain ⇒ many exact duplicates on both sides
      val left = Seq.fill(300)((rnd.nextInt(5).toLong + 1,
        rnd.nextInt(12).toLong * 10, rnd.nextLong().abs % 100000)).toDF("u", "ts", "lid")
      val right = Seq.fill(300)((rnd.nextInt(5).toLong + 1,
        rnd.nextInt(12).toLong * 10, rnd.nextLong().abs % 100000)).toDF("ru", "rts", "tie")
      assert(asofNative(left, right) == asofRef(left, right))
    }
  }

  test("as-of partition invariance: pre-shuffled inputs produce identical output") {
    val rnd = new scala.util.Random(66)
    val left = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(9).toLong,
      rnd.nextInt(1000).toLong)).toDF("u", "ts", "lid")
    val right = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(9).toLong,
      rnd.nextInt(1000).toLong)).toDF("ru", "rts", "tie")
    val a = asofNative(left, right)
    val b = asofNative(left.repartition(13, col("lid")), right.repartition(7, col("tie")))
    assert(a == b)
  }

  // ---- interval: left (u, ts, lid); right (ru, rts) ----

  private def intervalRef(left: DataFrame, right: DataFrame, w: Long): Set[(Long, Long)] =
    left.join(right,
        left("u") === right("ru") &&
          right("rts") >= left("ts") && right("rts") < left("ts") + lit(w))
      .groupBy(col("lid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def intervalNative(left: DataFrame, right: DataFrame, w: Long): Set[(Long, Long)] =
    IntervalJoin.interval(left, right, "u", "ts", "ru", "rts", w)
      .groupBy(col("lid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("interval boundaries: lower bound closed, upper bound open, duplicates multiply") {
    val left = Seq((1L, 100L, 1L)).toDF("u", "ts", "lid")
    val right = Seq(
      (1L, 99L), (1L, 100L), (1L, 100L), // 99 below; two ts==lower both count
      (1L, 149L), (1L, 150L), (1L, 151L) // 149 in; 150 == upper bound is OUT
    ).toDF("ru", "rts")
    val got = intervalNative(left, right, 50L)
    assert(got == intervalRef(left, right, 50L))
    assert(got == Set((1L, 3L)), s"[100,150) over {99,100,100,149,150,151} must count 3: $got")
  }

  test("interval: duplicate LEFT rows each produce their own count") {
    val left = Seq((1L, 100L, 1L), (1L, 100L, 2L), (1L, 120L, 3L)).toDF("u", "ts", "lid")
    val right = Seq((1L, 100L), (1L, 110L), (1L, 130L)).toDF("ru", "rts")
    val got = intervalNative(left, right, 25L)
    assert(got == intervalRef(left, right, 25L))
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 1L)))
  }

  test("interval: native == theta reference on 300-row random frames with heavy ts ties") {
    val rnd = new scala.util.Random(2026)
    (1 to 10).foreach { _ =>
      val left = Seq.tabulate(300)(i => (rnd.nextInt(5).toLong + 1,
        rnd.nextInt(40).toLong, i.toLong)).toDF("u", "ts", "lid")
      val right = Seq.fill(300)((rnd.nextInt(5).toLong + 1,
        rnd.nextInt(40).toLong)).toDF("ru", "rts")
      val w = 1L + rnd.nextInt(15)
      assert(intervalNative(left, right, w) == intervalRef(left, right, w),
        s"window=$w")
    }
  }

  // ---- round-13 review guards: type contract, NULLs, self-join, window ----

  test("as-of/interval: NULL key or ts rows are DROPPED, never matched as 0") {
    // row with u=NULL, plus a REAL user 0 it must not collide with
    val left = Seq((Some(0L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(0L), None, 3L)).toDF("u", "ts", "lid")
    val right = Seq((Some(0L), Some(90L), 5L), (None, Some(90L), 6L),
      (Some(0L), None, 7L)).toDF("ru", "rts", "tie")
    val asof = AsofJoin.asof(left, right, "u", "ts", "ru", "rts", "tie")
      .select("lid", "tie").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the fully-non-null pair joins; SQL semantics (the oracle's
    // equijoin drops NULL keys) — before the round-13 guard a NULL slot
    // read as getLong 0 and joined as "user 0"
    assert(asof == Set((1L, 5L)))
    // interval is forward-looking (rts in [lts, lts+w)): give the non-null
    // right row a ts AFTER the left's
    val rightIv = Seq((Some(0L), Some(110L)), (None, Some(110L)),
      (Some(0L), None)).toDF("ru", "rts")
    val iv = IntervalJoin.interval(left.select(col("u"), col("ts"), col("lid")),
        rightIv, "u", "ts", "ru", "rts", 1000L)
      .select("lid").collect().map(_.getLong(0)).toSet
    assert(iv == Set(1L), "interval: only the non-null pair matches")
  }

  test("as-of/interval: non-long-backed key columns are rejected, not misread") {
    val left = Seq((1, 100L, 1L)).toDF("u", "ts", "lid") // IntegerType u
    val right = Seq((1L, 90L, 5L)).toDF("ru", "rts", "tie")
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, "u", "ts", "ru", "rts", "tie")
    }
    assert(e1.getMessage.contains("long-backed"))
    val e2 = intercept[IllegalArgumentException] {
      IntervalJoin.interval(left, right, "u", "ts", "ru", "rts", 10L)
    }
    assert(e2.getMessage.contains("long-backed"))
  }

  test("as-of/interval: self-join on the same analyzed plan fails fast " +
    "instead of emitting duplicate exprIds") {
    val df = Seq((1L, 100L, 1L)).toDF("u", "ts", "lid")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(df, df, "u", "ts", "u", "ts", "lid")
    }
    assert(e.getMessage.contains("fresh attributes"))
    val e2 = intercept[IllegalArgumentException] {
      IntervalJoin.interval(df, df, "u", "ts", "u", "ts", 10L)
    }
    assert(e2.getMessage.contains("fresh attributes"))
    // the documented workaround WORKS: re-select with new aliases
    val r = df.select(df.columns.map(c => col(c).as(c + "_r")): _*)
    val ok = IntervalJoin.interval(df, r, "u", "ts", "u_r", "ts_r", 10L)
    assert(ok.count() == 1L)
  }

  test("interval: non-positive window is rejected, not silently empty") {
    val df = Seq((1L, 100L, 1L)).toDF("u", "ts", "lid")
    val r = df.select(col("u").as("ru"), col("ts").as("rts"))
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.interval(df, r, "u", "ts", "ru", "rts", 0L)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("timestamp-typed key/ts columns still pass the long-backed guard") {
    // the declared queries feed TIMESTAMP columns straight in — the guard
    // must accept all 8-byte long-backed types, not only BIGINT
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1L))
      .toDF("u", "ts", "lid")
    val right = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 5L))
      .toDF("ru", "rts", "tie")
    val got = AsofJoin.asof(left, right, "u", "ts", "ru", "rts", "tie")
      .select("lid", "tie").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 5L)))
  }
}
