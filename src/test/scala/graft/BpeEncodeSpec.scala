package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** llm_bpe_encode invariants (round 14, VERDICT r13 task 2). The merge
  * table is the data-dependent training loop's output, so the query is
  * no-oracle — these pins replace the DuckDB hash:
  *   1. encode ≡ a scalar replay of the trained merges (the training
  *      loop's own state evolution), word for word;
  *   2. merge-free identity: with zero merges, n_sym = word length;
  *   3. partition-layout invariance of the declared query;
  *   4. corpus conservation: ws_tokens ≤ bpe_tokens ≤ chars, and the
  *      chars-per-token ratio is ≥ 1. */
class BpeEncodeSpec extends AnyFunSuite {
  import TestSpark._

  test("encodeDict equals a scalar replay of the trained merges") {
    import spark.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("a", 1L), ("newlow", 4L))
    val dict = words.toDF("word", "freq")
    val merges = BpeTrain.bpeMerges(spark, dict, 5).map(m => (m._2, m._3))
    val got = BpeTrain.encodeDict(dict, merges)
      .select("word", "sym", "n_sym")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // scalar replay: same seeding, same boundary-guarded left-to-right
    // non-overlapping replacement, same order
    words.foreach { case (w, _) =>
      var sym = w.toCharArray.mkString(" ")
      merges.foreach { case (l, r) =>
        val pat = "(?<![^ ])" + java.util.regex.Pattern.quote(l + " " + r) + "(?![^ ])"
        sym = sym.replaceAll(pat, l + r)
      }
      assert(got(w) === ((sym, sym.split(" ").length.toLong)), s"word $w")
    }
  }

  test("merge-free vocabulary encodes to one symbol per character") {
    import spark.implicits._
    val dict = Seq(("alpha", 1L), ("z", 2L), ("qq", 3L)).toDF("word", "freq")
    val got = BpeTrain.encodeDict(dict, Seq.empty)
      .select("word", "n_sym").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("alpha" -> 5L, "z" -> 1L, "qq" -> 2L))
  }

  test("llm_bpe_encode is partition-layout-invariant and conserves the token ledger") {
    val a = BpeTrain.llmBpeEncode(spark, sf0001).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val ws = r.getAs[Long]("ws_tokens")
      val bpe = r.getAs[Long]("bpe_tokens")
      val chars = r.getAs[Long]("chars")
      // every word is ≥ 1 symbol and merges only shrink symbol counts
      assert(ws <= bpe, s"lang ${r.getString(0)}: ws_tokens $ws > bpe_tokens $bpe")
      assert(bpe <= chars, s"lang ${r.getString(0)}: bpe_tokens $bpe > chars $chars")
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
    // rerun in the same session: memoized merge table, deterministic agg
    val b = BpeTrain.llmBpeEncode(spark, sf0001).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("trained-corpus encode agrees with the trainer's final state symbol total") {
    // the encode of the TRAINING dict under the trained merges must carry
    // exactly the weighted symbol count the training loop's ledger ends
    // at: initial weighted chars minus each round's recorded shrinkage
    import spark.implicits._
    val words = (1 to 120).map(i => (s"tok${i % 9}ab${i % 4}", (i % 6 + 1).toLong))
    val dict = words.toDF("word", "freq")
    val merges = BpeTrain.bpeMerges(spark, dict, 6)
    val encoded = BpeTrain.encodeDict(dict, merges.map(m => (m._2, m._3)))
      .select(col("n_sym") * col("freq"))
      .collect().map(_.getLong(0)).sum
    // independent replay of the ledger on the driver
    var syms = words.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
    merges.foreach { case (_, l, r, _) =>
      val pat = "(?<![^ ])" + java.util.regex.Pattern.quote(l + " " + r) + "(?![^ ])"
      syms = syms.map { case (s, f) => (s.replaceAll(pat, l + r), f) }
    }
    val replayTotal = syms.map { case (s, f) => s.split(" ").length * f }.sum
    assert(encoded === replayTotal)
  }
}
