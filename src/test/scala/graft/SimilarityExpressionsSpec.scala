package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.sim

/** The native Catalyst expressions must be bit-identical to the HOF
  * formulations they replace (same accumulation order), work through both
  * codegen and the SQL registration, and handle edge shapes. */
class SimilarityExpressionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("jaccard_sim equals the array_intersect/array_union formulation") {
    val docs = Tables.documents(spark, sf0001).limit(200)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("t"))
    val pairs = docs.select(col("doc_id").as("a"), col("t").as("ta"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("t").as("tb")))
      .filter(col("a") < col("b")).limit(5000)
    val hof = size(array_intersect(col("ta"), col("tb"))).cast("double") /
      size(array_union(col("ta"), col("tb")))
    val diff = pairs
      .select(sim.jaccardSim(col("ta"), col("tb")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")) // bit-exact, not approximate
      .count()
    assert(diff === 0)
  }

  test("cosine_sim is bit-identical to the zip_with+aggregate pipeline") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).limit(100)
    val pairs = e.select(col("vec_id").as("a"), col("v").as("va"))
      .crossJoin(e.select(col("vec_id").as("b"), col("v").as("vb")))
      .filter(col("a") < col("b"))
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val hof = dot(col("va"), col("vb")) /
      (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb"))))
    val diff = pairs
      .select(sim.cosineSim(col("va"), col("vb")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff === 0)
  }

  test("expressions are registered as SQL functions via GraftExtensions") {
    val r = spark.sql(
      """SELECT round(jaccard_sim(array('a','b','c'), array('b','c','d')), 6) AS j,
        |       round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c""".stripMargin).head()
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 1.0)
  }

  test("edge shapes: empty arrays and duplicate tokens") {
    val r = spark.sql(
      """SELECT jaccard_sim(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>)) AS both_empty,
        |       jaccard_sim(array('a','a','b'), array('a','b','b')) AS dups""".stripMargin).head()
    assert(r.getDouble(0) === 0.0) // empty-union convention
    assert(r.getDouble(1) === 1.0) // duplicates ignored (set semantics)
  }

  test("cosine_sim fails fast on length mismatch instead of reading garbage") {
    // UnsafeArrayData.getDouble has no bounds check: before the round-13
    // guard, iterating a 3-element a over a 2-element b read whatever
    // followed b in the row buffer and returned a silently-wrong number.
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    val ex = intercept[Throwable] {
      spark.sql(
        "SELECT cosine_sim(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d))").head()
    }
    assert(msgs(ex).exists(_.contains("equal length")), msgs(ex).mkString(" | "))
  }
}
