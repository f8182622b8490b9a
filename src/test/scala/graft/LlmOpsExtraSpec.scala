package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Semantics of the extended pipeline operators: fingerprint dedup
  * properties, SimHash vs Jaccard agreement, IVF recall vs brute force,
  * multimodal stub pipeline shape. */
class LlmOpsExtraSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("retrieval-eval fixture contract: every documents.doc_id has an embeddings label") {
    // llmRetrievalEval inner-joins retrieved doc_ids against the
    // embeddings label table (and the oracle does the same, so parity
    // holds either way) — but a BM25 hit with no label row would be
    // SILENTLY dropped from the rr / p10 numerators, understating the
    // lexical leg (ADVICE r14). Pin the id-coverage invariant the metric
    // relies on at the fixture grain so a fixture regeneration that
    // breaks doc_id ⊆ vec_id fails HERE, not as a quietly-deflated metric.
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"))
    val labeled = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("doc_id"))
    val orphans = docs.join(labeled, Seq("doc_id"), "left_anti").count()
    assert(orphans === 0L,
      s"$orphans documents.doc_id values have no embeddings.vec_id label row — " +
        "llm_retrieval_eval's inner label join would silently drop their hits")
  }

  test("identical texts share a fingerprint; n_sharing counts them") {
    val out = LlmOpsExtra.llmFingerprint(spark, sf0001)
    assert(out.count() === 500)
    // fingerprint groups are consistent: n_sharing equals the real group size
    val bad = out.groupBy("fp")
      .agg(count(lit(1)).as("actual"), max("n_sharing").as("claimed"))
      .filter(col("actual") =!= col("claimed")).count()
    assert(bad === 0)
  }

  test("language-ID confusion matrix covers every doc exactly once") {
    val out = LlmOpsExtra.llmLangId(spark, sf0001)
    assert(out.agg(sum("n")).head().getLong(0) === 500L)
    // synthetic corpus shares one vocab → the marker heuristic lands on 'en'
    val preds = out.select("predicted").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("quality buckets are within [0,10] and partition the corpus") {
    val out = LlmOpsExtra.llmQuality(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 500L)
    assert(out.forall { r => val b = r.getAs[Int]("bucket"); b >= 0 && b <= 10 })
  }

  test("simhash pairs at hamming<=3 are high-jaccard near-dups") {
    val sh = LlmOpsExtra.llmSimhash(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(sh.nonEmpty, "no simhash candidates at this sf")
    // compute exact jaccard for the reported pairs; they should skew high
    val toksDf = Tables.documents(spark, sf0001)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("t"))
    val pairs = sh.toSeq.toDF("a_id", "b_id")
    val j = pairs
      .join(toksDf.select(col("doc_id").as("a_id"), col("t").as("ta")), "a_id")
      .join(toksDf.select(col("doc_id").as("b_id"), col("t").as("tb")), "b_id")
      .select((size(array_intersect(col("ta"), col("tb"))).cast("double") /
        size(array_union(col("ta"), col("tb")))).as("jac"))
      .agg(avg("jac")).head().getDouble(0)
    assert(j >= 0.8, s"mean jaccard of simhash pairs = $j")
  }

  test("IVF ANN achieves reasonable recall of brute-force top-5") {
    val brute = LlmOps.llmKnnJoin(spark, sf0001)
      .filter(col("q_id") < 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = LlmOpsExtra.llmAnnIvf(spark, sf0001)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    // with the Lloyd's-trained codebook (3 iterations from seeded-Gaussian
    // pivots — round 7), nprobe=8 of 16 cells measures 0.867 recall at
    // sf0.001 — the 0.8 bound keeps a codebook regression (untrained
    // pivots, too-low nprobe) failing loudly while leaving margin for
    // fixture drift. Gaussian seeds need a higher nprobe/K ratio than the
    // round-6 data-point seeds did (0.87 at nprobe=4): random directions
    // fit the data distribution worse at tiny SF, the honest cost of not
    // pretending corpus rows are a sample.
    assert(recall >= 0.8, s"recall=$recall")
    assert(ivf.size === 15, "3 queries × 5 results")
  }

  test("multimodal resize fits the 64x64 box and preserves aspect order") {
    val rs = operators.Multimodal.resizeAll(spark, sf0001).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.tw <= 64 && r.th <= 64, s"doc ${r.doc_id}: ${r.tw}x${r.th}")
      assert(r.tw <= r.w && r.th <= r.h, "resize must never upscale")
      // aspect ORDER preserved: the longer input side stays the longer one
      assert((r.w >= r.h) == (r.tw >= r.th), s"doc ${r.doc_id} aspect flipped")
      assert(r.out_bytes === r.tw.toLong * r.th)
    }
  }

  test("multimodal frame-sample keeps at most 8+ceiling slack frames, at least 1") {
    val fs = operators.Multimodal.llmMmFramesample(spark, sf0001).collect()
    assert(fs.nonEmpty)
    // per-doc invariant checked through the typed pass
    val per = operators.Multimodal.mediaTable(spark, sf0001).collect().map { r =>
      val frames = (r.media.length + 255) / 256
      val s = math.max(1, frames / 8)
      (frames + s - 1) / s
    }
    assert(per.forall(k => k >= 1 && k <= 9), s"kept out of range: ${per.max}")
  }

  test("multimodal stub decode is deterministic and partition-independent") {
    val f1 = operators.Multimodal.decodeAll(spark, sf0001)
    val once = f1.collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val repartitioned = operators.Multimodal.mediaTable(spark, sf0001)
      .repartition(7)
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, fs) = operators.Multimodal.decodeStub(r.media)
          MediaFeatures(r.doc_id, r.lang, r.media.length.toLong, w, h, fs)
        }
      }
    val again = repartitioned.collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(once === again)
    assert(once.values.forall(_.length === 8), "fixed-size feature vector")
    val stats = operators.Multimodal.llmMmFeatures(spark, sf0001)
    assert(stats.agg(sum("n")).head().getLong(0) === 500L)
  }
}
