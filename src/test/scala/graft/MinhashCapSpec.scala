package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LlmOps

/** llmMinhashCapped (round 12, VERDICT r11 task 4): the df-cap defense
  * for undeduplicated corpora, pinned HubCollapseSpec-style:
  * bit-equality with the direct form on bucket-width-bounded corpora
  * (the recall floor — a cap must never cost pairs where buckets are
  * narrow), strict subset under crafted verbatim duplication, and exact
  * within-cap pair survival. */
class MinhashCapSpec extends AnyFunSuite {
  import TestSpark._

  /** A bucket-width-BOUNDED corpus: 60 documents in 20 near-dup triples,
    * each triple over its own disjoint vocabulary — every band bucket
    * holds at most one triple (≤ 3 ≪ cap), so the cap must be a no-op.
    * (The sf0.001 documents FIXTURE is deliberately duplication-heavy —
    * direct emits 31k pairs from buckets far wider than 64 — so
    * fixture-equality is the wrong pin there; the subset invariant and
    * the crafted tests below carry it instead.) */
  private lazy val narrowDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mincapn_").toString
    val docs = (0 until 20).flatMap { g =>
      val vocab = (0 until 12).map(i => s"w${g}_$i")
      Seq(
        (g * 10L + 1, vocab.mkString(" ")),                 // full set
        (g * 10L + 2, vocab.mkString(" ")),                 // verbatim dup
        (g * 10L + 3, (vocab.take(11) :+ s"x$g").mkString(" "))) // near-dup 11/13
    }
    docs.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("cap=64 is bit-identical to the direct form on a bucket-width-bounded corpus") {
    val capped = LlmOps.llmMinhashCapped(spark, narrowDir, cap = 64)
    val direct = LlmOps.llmMinhash(spark, narrowDir)
    assert(capped.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(capped).count() == 0)
    assert(capped.count() > 0)
  }

  /** A corpus of one 8-doc verbatim duplicate class plus bystanders. */
  private lazy val dupDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mincap_").toString
    val dup = (1L to 8L).map(i => (i, "a b c d e f g h"))
    val solo = Seq((20L, "x y z w"), (21L, "p q r s t"))
    (dup ++ solo).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("crafted 8-dup class: cap=4 keeps exactly the within-cap pairs, " +
    "a strict subset of direct") {
    val direct = LlmOps.llmMinhash(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmOps.llmMinhashCapped(spark, dupDir, cap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // direct enumerates all C(8,2)=28 pairs of the verbatim class
    assert(direct == (for (a <- 1L to 8L; b <- (a + 1) to 8L) yield (a, b)).toSet)
    // every band bucket holds the whole class (identical signatures);
    // cap=4 keeps the 4 lowest doc_ids ⇒ exactly C(4,2)=6 pairs survive
    assert(capped == (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet)
    assert(capped.subsetOf(direct))
  }

  test("subset invariant holds at every cap on the (duplication-heavy) fixture") {
    val direct = LlmOps.llmMinhash(spark, sf0001)
    Seq(2, 8, 64).foreach { c =>
      val capped = LlmOps.llmMinhashCapped(spark, sf0001, cap = c)
      assert(capped.exceptAll(direct).count() == 0,
        s"cap=$c emitted a pair the direct form does not")
    }
  }

  test("determinism: capped output identical across partitionings") {
    val a = LlmOps.llmMinhashCapped(spark, dupDir, cap = 4).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = LlmOps.llmMinhashCapped(spark, dupDir, cap = 4).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
