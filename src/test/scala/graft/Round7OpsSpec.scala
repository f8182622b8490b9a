package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._

/** Round-7 additions: batch sessionization, per-source document cap
  * (native TopKPerKey path), duplicated-substring share. Each test pins
  * the operator against an independent reference formulation, not just
  * output invariants. */
class Round7OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("sess_batch: matches a sequential per-user reference sessionizer") {
    val out = Analytics.sessBatch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // sequential reference: sort each user's events, cut at >30-min gaps
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var sess = 0L
      var prev = Long.MinValue
      val acc = scala.collection.mutable.Map[(Long, Long), (Long, Long, Long)]()
      sorted.foreach { case (_, us, _) =>
        if (prev == Long.MinValue || us - prev > 1800000000L) sess += 1
        val (n, lo, hi) =
          acc.getOrElse((uid, sess), (0L, Long.MaxValue, Long.MinValue))
        acc((uid, sess)) = (n + 1, math.min(lo, us), math.max(hi, us))
        prev = us
      }
      acc.map { case (k, (n, lo, hi)) => k -> (n, hi - lo) }
    }.toMap
    assert(out.size === ref.size, "session count")
    assert(out === ref, "per-session event counts and durations")
  }

  test("llm_source_cap: native TopKPerKey cap equals the window-rank form") {
    val out = LlmOpsPipeline.llmSourceCap(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val ref = Tables.documents(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("total"),
        sum(when(col("rn") <= 10, 1L).otherwise(0L)).as("kept"),
        sum(when(col("rn") > 10, 1L).otherwise(0L)).as("dropped"),
        sum(when(col("rn") <= 10, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out === ref)
    out.values.foreach { case (total, kept, dropped, _) =>
      assert(kept <= 10 && kept + dropped == total)
    }
  }

  test("llm_bloom_dedup: bloom pre-filter output equals the exact no-bloom join") {
    // sf0.01: the split produces real drops there (5 of 50 batch docs
    // share a winnowing fingerprint with history)
    val got = LlmOpsExtra.llmBloomDedup(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // exact reference: same fingerprint, plain IN-history semi join, no
    // bloom anywhere — proves false positives were all verified away and
    // no false negative dropped a row
    val toks = split(col("text"), " ")
    val nsh = greatest(size(toks) - 7, lit(1))
    val fp = array_min(transform(sequence(lit(1), nsh),
      i => md5(concat_ws(" ", slice(toks, i, lit(8))).cast("binary"))))
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("lang"), fp.as("fp"))
    val histFp = docs.filter(col("doc_id") % 10 =!= 0)
      .select("fp").distinct().collect().map(_.getString(0)).toSet
    val ref = docs.filter(col("doc_id") % 10 === 0).collect()
      .groupBy(_.getString(1)).map { case (lang, rows) =>
        val dropped = rows.count(r => histFp(r.getString(2)))
        lang -> (rows.size.toLong, rows.size.toLong - dropped, dropped.toLong)
      }
    assert(got === ref)
    assert(got.values.map(_._3).sum > 0, "fixture split should produce real drops")
  }

  test("llm_substring_dedup: matches an unhashed string-shingle reference; shares bounded") {
    val rows = LlmOpsExtra.llmSubstringDedup(spark, sf001).collect()
    rows.foreach { r =>
      val (n, dup, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && dup >= 0 && dup <= n)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - dup.toDouble / n) < 1e-6)
    }
    // independent reference: raw STRING shingles (no xxhash64, no
    // checkpoint, no join-back — plain per-shingle df via groupBy on the
    // string), sequential in driver memory. Catches any hashing or
    // join-shape corruption in the operator's distributed form.
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).sliding(8).map(_.mkString(" ")).toSet)
    val df = scala.collection.mutable.Map[String, Int]()
    docs.foreach(_._2.foreach(s => df(s) = df.getOrElse(s, 0) + 1))
    val ref = docs.map { case (id, sh) =>
      id -> (sh.size.toLong, sh.count(df(_) >= 2).toLong)
    }.toMap
    // docs shorter than 8 tokens shingle to the greatest(...,1) guard row
    // in the operator; the fixture's min doc length is 10 tokens, so
    // sliding(8) and the operator agree everywhere
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId === ref)
    assert(ref.values.exists(_._2 > 0), "fixture should contain shared shingles")
  }
}
