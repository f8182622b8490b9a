package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.TimeSeries

/** ts_changepoint_deep (round 12, VERDICT r11 task 6): depth-k binary
  * segmentation with a min-segment guard, pinned on CRAFTED
  * multi-changepoint series (the fixture pin the verdict asked for) and
  * against an independent scalar recursion replay on random series.
  */
class ChangepointDeepSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def day(i: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusDays(i.toLong))

  private def dailyDf(cs: Seq[Long], typ: String = "x"): DataFrame =
    cs.zipWithIndex.map { case (c, i) => (typ, day(i), c) }
      .toDF("event_type", "day", "c")

  private def run(cs: Seq[Long], depth: Int = 4, minSeg: Long = 8L) =
    TimeSeries.changepointDeepFrom(dailyDf(cs), depth, minSeg)
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        r.getTimestamp(4), r.getLong(5)))
      .toSeq

  /** Independent scalar recursion: same statistic, same tie rule, same
    * guard — no Spark, no windows. */
  private def replay(cs: Seq[(Timestamp, Long)], depth: Int, minSeg: Int)
      : Seq[(Long, String, Long, Timestamp, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Timestamp, Long)]
    def rec(days: Vector[(Timestamp, Long)], path: String, level: Int): Unit = {
      val m = days.size
      if (level > depth || m < minSeg) return
      val t = days.map(_._2).sum
      var cum = 0L
      var bestI = -1; var bestDev = -1L
      var i = 1
      while (i < m) { // interior splits only
        cum += days(i - 1)._2
        val dev = math.abs(m.toLong * cum - i.toLong * t)
        if (dev > bestDev) { bestDev = dev; bestI = i } // ties → earlier day
        i += 1
      }
      out += ((level.toLong, path, m.toLong, days(bestI - 1)._1, bestDev))
      rec(days.take(bestI), path + ".pre", level + 1)
      rec(days.drop(bestI), path + ".post", level + 1)
    }
    rec(cs.toVector, "all", 1)
    out.toSeq.sortBy(r => (r._1, r._2))
  }

  test("single clean step: level-1 split lands exactly on the step day") {
    val cs = Seq.fill(12)(0L) ++ Seq.fill(12)(1200L)
    val got = run(cs)
    val lvl1 = got.filter(_._1 == 1L)
    assert(lvl1.size == 1)
    assert(lvl1.head._4 === day(11), "argmax CUSUM must sit on the last pre-step day")
    assert(lvl1.head._3 === 24L)
  }

  test("two staircase changepoints are both recovered (level 1 + level 2)") {
    val cs = Seq.fill(10)(0L) ++ Seq.fill(10)(500L) ++ Seq.fill(10)(1500L)
    val got = run(cs)
    val lvl1 = got.filter(_._1 == 1L)
    assert(lvl1.head._4 === day(19), "bigger step (day 20) splits first")
    val lvl2pre = got.filter(r => r._1 == 2L && r._2 == "all.pre")
    assert(lvl2pre.size == 1)
    assert(lvl2pre.head._4 === day(9), "smaller step recovered inside the pre regime")
  }

  test("min-segment guard: short series and short regimes are leaves") {
    assert(run(Seq.fill(7)(100L)).isEmpty, "7 days < minSeg 8 ⇒ no splits at all")
    // 10 days: level 1 splits, children (≤9 days) can only split if ≥ 8
    val got = run(Seq.fill(5)(0L) ++ Seq.fill(5)(900L))
    assert(got.filter(_._1 == 1L).size == 1)
    got.filter(_._1 > 1L).foreach(r => assert(r._3 >= 8L,
      s"segment of ${r._3} days below the guard must not have split"))
  }

  test("engine == independent scalar recursion on 50 random series (depth 4)") {
    val rnd = new scala.util.Random(1204)
    (1 to 50).foreach { _ =>
      val n = 8 + rnd.nextInt(60)
      val cs = Seq.fill(n)(rnd.nextInt(2000).toLong)
      val withDays = cs.zipWithIndex.map { case (c, i) => (day(i), c) }
      val got = run(cs).sortBy(r => (r._1, r._2))
      val expect = replay(withDays, depth = 4, minSeg = 8)
      assert(got == expect, s"n=$n series=${cs.take(12).mkString(",")}…")
    }
  }

  test("fixture determinism: two runs bit-identical, levels bounded by 4") {
    val a = TimeSeries.tsChangepointDeep(spark, sf0001).collect().toSeq
    val b = TimeSeries.tsChangepointDeep(spark, sf0001).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 4L))
    // every split's children that reappear at the next level partition it
    val bySeg = a.map(r => (r.getString(0), r.getString(2)) -> r.getLong(3)).toMap
    a.foreach { r =>
      val (typ, seg, days) = (r.getString(0), r.getString(2), r.getLong(3))
      (bySeg.get((typ, s"$seg.pre")), bySeg.get((typ, s"$seg.post"))) match {
        case (Some(p), Some(q)) => assert(p + q == days,
          s"$typ/$seg children must partition the segment")
        case _ => ()
      }
    }
  }
}
