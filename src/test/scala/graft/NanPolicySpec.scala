package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 NaN policy (VERDICT r11 task 5): zero-norm embeddings yield
  * cosine = NaN, and NaN ranks ABOVE every number in both Spark and
  * DuckDB — so any top-k or threshold that admits NaN returns garbage
  * first. The policy is explicit exclusion (!isnan in the engine, NOT
  * isnan in the oracle) across the similarity family: llm_cosine_knn,
  * llm_knn_join, llm_semdedup, llm_emb_neardup (the last pinned in
  * HubCollapseSpec alongside its collapse-parity invariants).
  */
class NanPolicySpec extends AnyFunSuite {
  import TestSpark._

  /** A corpus whose query vector is fine but which contains zero-norm
    * rows that would rank top-of-list under NaN-is-greatest. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_nanpol_").toString
    val zero = Seq.fill(4)(0.0f)
    def v(x: Double, y: Double): Seq[Float] = Seq(x.toFloat, y.toFloat, 0f, 0f)
    ((0L to 30L).map { i =>
      val lbl = (i % 3).toInt
      if (i >= 25L) (i, lbl, zero)              // six zero-norm rows
      else (i, lbl, v(1.0, 0.01 * i))
    }).toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("llm_cosine_knn: zero-norm rows never reach the top-10") {
    val rows = operators.LlmOps.llmCosineKnn(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(0) < 25L, s"zero-norm vec ${r.getLong(0)} leaked into top-k")
      assert(!r.getDouble(1).isNaN)
    }
  }

  test("llm_knn_join: every returned neighbor has a real sim") {
    val rows = operators.LlmOps.llmKnnJoin(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getDouble(3).isNaN)
      assert(r.getLong(2) < 25L, s"zero-norm neighbor ${r.getLong(2)} leaked")
    }
  }

  test("llm_semdedup: zero-norm rows are never counted as duplicates") {
    val out = operators.LlmOpsExtra.llmSemdedup(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // 6 zero-norm rows (vec_id 25..30, labels 1,2,0,1,2,0) all share an
    // LSH bucket trivially (all projections = 0 ⇒ same sign pattern), so
    // without the guard they'd mark each other dropped; with it they are
    // all kept
    val totalKept = out.map(_._2).sum
    val totalDropped = out.map(_._3).sum
    assert(totalKept + totalDropped == 31L)
    // every zero-norm row kept ⇒ dropped count is entirely from the
    // real near-parallel vectors
    assert(totalDropped <= 25L)
    val perLabelZero = Map(0 -> 2L, 1 -> 2L, 2 -> 2L)
    out.foreach { case (lbl, kept, _) =>
      assert(kept >= perLabelZero(lbl), s"label $lbl kept=$kept — a zero-norm row was dropped")
    }
  }

  test("fixture outputs unchanged by the guard: no zero-norm vectors at sf0.001") {
    val n = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("nrm"))
      .filter(col("nrm") === 0.0).count()
    assert(n == 0L, "fixture grew zero-norm vectors — re-certify the similarity family")
  }
}
