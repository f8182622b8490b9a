package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** §2.J semantics: similarity math on known vectors, MinHash-LSH recall
  * against exact Jaccard (SURVEY §5.2.3), TF-IDF formula check. */
class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("cosine of a vector with itself is 1; orthogonal is 0") {
    val df = Seq(
      (Seq(1.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 5.0, 0.0))
    ).toDF("a", "b")
    val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val sims = df.select(
      round(dot(col("a"), col("b")) /
        (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b")))), 6).as("sim"))
      .collect().map(_.getDouble(0))
    assert(sims.toSeq === Seq(1.0, 0.0))
  }

  test("knn join returns 5 ranked neighbors per query, self excluded") {
    val out = LlmOps.llmKnnJoin(spark, sf0001).collect()
    assert(out.length === 25) // 5 queries × 5 neighbors
    assert(out.forall(r => r.getLong(2) != r.getLong(0)), "self must be excluded")
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "sims descend with rank")
    }
  }

  test("exact dedup keeps one survivor per distinct text") {
    val kept = LlmOps.llmDedupExact(spark, sf0001)
      .agg(sum("kept")).head().getLong(0)
    val distinctTexts = Tables.documents(spark, sf0001).select("text").distinct().count()
    assert(kept === distinctTexts)
  }

  test("minhash-LSH candidates achieve high recall of exact jaccard>=0.8 pairs") {
    val exact = LlmOps.llmDedupNear(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = LlmOps.llmMinhash(spark, sf0001)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty, "no exact near-dup pairs at this sf")
    val recall = exact.count(cand.contains).toDouble / exact.size
    // 4 bands × 4 rows ⇒ theoretical recall ≈ 0.88 at j=0.8, →1 as j→1.
    // Exact pairs are blocked by (lang, band); LSH sees all pairs, so
    // recall of the blocked set should be at least the theoretical floor.
    assert(recall >= 0.7, s"recall=$recall over ${exact.size} exact pairs")
  }

  test("tfidf picks the highest-scoring term with term tie-break") {
    // 3 docs over a tiny vocab; doc 0: 'a' dominates but appears everywhere
    // (low idf); 'rare' appears twice in doc 0 only (high idf) and must win.
    val docs = Seq(
      (0L, "a a a rare rare b"),
      (1L, "a b c"),
      (2L, "a c c")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tiny_docs")
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
    val top = tf.join(df, "tok").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), 6))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("doc_id", "tok").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(0L) === "rare")
  }

  test("centroid radius is 0 for a label whose vectors are identical") {
    val df = Seq(
      (0L, 1, Seq(1.0f, 2.0f)), (1L, 1, Seq(1.0f, 2.0f)),
      (2L, 2, Seq(0.0f, 0.0f)), (3L, 2, Seq(2.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val el = df.select(col("vec_id"), col("label"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
    val c = el.groupBy("label", "i").agg(avg("x").as("cx"))
    val d = el.join(c, Seq("label", "i"))
      .groupBy("vec_id", "label").agg(sqrt(sum(pow(col("x") - col("cx"), 2))).as("dist"))
    val radii = d.groupBy("label").agg(round(avg("dist"), 6).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(radii(1) === 0.0)
    assert(radii(2) === 1.0) // centroid (1,0); both at distance 1
  }
}
