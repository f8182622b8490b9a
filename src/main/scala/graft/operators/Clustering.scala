package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate CLUSTERING: connected components over the verified
  * near-dup pair graph via iterative min-label propagation — the step
  * that turns pairwise dedup into survivor sets (keep cluster minimum,
  * drop the rest), and the engine's demonstration of ITERATIVE dataflow
  * (driver-coordinated fixpoint loop over DataFrames, the Pregel shape).
  *
  * Scale notes: each iteration is one shuffle join (edges ⋈ labels) plus
  * a min-aggregate; iteration count = graph diameter (near-dup clusters
  * are dense, so 2–4 rounds in practice, capped at 20). Lineage is
  * truncated every round with localCheckpoint — without it the plan
  * doubles per iteration and the 10th round recompiles a 1000-node tree.
  * The fixpoint (min reachable doc_id per node) is order-independent and
  * engine-independent, so the result is oracle-able via a recursive CTE.
  */
object Clustering {

  def llmDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = LlmOps.llmDedupNear(spark, dir).select("a_id", "b_id")
    val edges = pairs
      .unionAll(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint(true) // edges are reused every iteration
    // init = the FIRST propagation round folded into one aggregate:
    // lbl₀ = min(self, direct neighbors) — no join needed, and dense
    // near-dup cliques converge one round earlier
    var labels = edges.groupBy(col("a_id").as("id"))
      .agg(least(min(col("b_id")), col("a_id")).as("lbl"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      // Each node's previous label rides along as `prev` (neighbors
      // contribute MaxValue, the self-row its own label), so the round is
      // ONE job — join + min-agg + eager checkpoint. Round 1 ran a second
      // full join-against-old-labels per round just to count changes.
      val nbr = edges.join(labels, edges("b_id") === labels("id"))
        .select(edges("a_id").as("id"), col("lbl"), lit(Long.MaxValue).as("prev"))
      val next = labels.select(col("id"), col("lbl"), col("lbl").as("prev"))
        .unionAll(nbr)
        .groupBy("id").agg(min("lbl").as("lbl"), min("prev").as("prev"))
        .localCheckpoint(true)
      // convergence probe reads the just-materialized blocks only (min(lbl)
      // ≤ prev always, so "changed" ⇔ lbl < prev; stop at the first hit)
      converged = next.filter(col("lbl") < col("prev")).limit(1).count() == 0L
      labels = next.select("id", "lbl")
      iter += 1
    }
    // partial labels would silently disagree with the recursive-CTE oracle
    require(converged, s"connected components did not converge in $iter rounds")
    val w = Window.partitionBy("cluster")
    labels
      .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      .withColumn("csize", count(lit(1)).over(w))
      .orderBy(col("doc_id").asc)
  }

  /** Edges of the fingerprint-sharing graph: doc pairs whose MINIMUM
    * 8-token shingle coincides (cliques per fingerprint group), canonical
    * a < b orientation. Only equality of the fingerprint matters here, so
    * the raw min-shingle string is the key — same winnowing-style min
    * selection as llm_fingerprint but WITHOUT the per-shingle md5 pass
    * (profiled: 2.5M md5 calls per side at sf0.1 made each graph query
    * ~6 s; the raw-min variant is one cheap map-side pass). ASCII-only
    * tokens ⇒ binary string order matches the oracle's. */
  private def fpEdges(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nsh = greatest(size(toks) - 7, lit(1))
    val fpCol = array_min(transform(sequence(lit(1), nsh),
      i => concat_ws(" ", slice(toks, i, lit(8)))))
    // the documents file is one small parquet split, so without a
    // repartition this ~1000-shingles-per-doc pass runs on ONE task;
    // spreading the 13 MB scan across the cores costs a tiny shuffle and
    // parallelizes the heavy map (6 s → sub-second at local[32])
    val fp = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), fpCol.as("fp"))
    val a = fp.select(col("fp"), col("doc_id").as("a"))
    val b = fp.select(col("fp").as("fp_b"), col("doc_id").as("b"))
    a.join(b, col("fp") === col("fp_b") && col("a") < col("b")).select("a", "b")
  }

  /** Distributed triangle counting over the fingerprint graph — the
    * classic two-join formulation (e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with
    * a < b < c, each triangle counted once). At scale this is two
    * shuffle equi-joins on node keys; the standard refinement (join on
    * the lower-degree endpoint) applies when degrees skew. */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = fpEdges(spark, dir)
    val e1 = e.select(col("a"), col("b"))
    val e2 = e.select(col("a").as("b"), col("b").as("c"))
    val e3 = e.select(col("a").as("ta"), col("b").as("tc"))
    e1.join(e2, "b")
      .join(e3, col("a") === col("ta") && col("c") === col("tc"))
      .agg(count(lit(1)).as("triangles"),
        countDistinct(col("a")).as("apex_nodes"))
  }

  /** Degree distribution of the fingerprint graph: how many nodes have
    * degree d — one symmetrized hash agg + one count-by-degree agg. */
  def graphDegree(spark: SparkSession, dir: String): DataFrame = {
    val e = fpEdges(spark, dir)
    e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("nodes"))
      .orderBy(col("degree").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_clusters" -> (llmDedupClusters _),
    "graph_triangles"    -> (graphTriangles _),
    "graph_degree"       -> (graphDegree _))

  /** Shared oracle fragment: min-shingle fingerprint edges in DuckDB. */
  private val fpEdgesSql: String =
    """f AS (
      |  SELECT doc_id,
      |    list_min(list_transform(
      |      generate_series(1, greatest(len(string_split(text,' ')) - 7, 1)),
      |      i -> array_to_string(list_slice(string_split(text,' '), i, i + 7), ' '))) AS fp
      |  FROM documents),
      |e AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b
      |  FROM f x JOIN f y ON x.fp = y.fp AND x.doc_id < y.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "graph_triangles" ->
      s"""WITH $fpEdgesSql
         |SELECT count(*) AS triangles, count(DISTINCT e1.a) AS apex_nodes
         |FROM e e1 JOIN e e2 ON e1.b = e2.a
         |          JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin,
    "graph_degree" ->
      s"""WITH $fpEdgesSql,
         |deg AS (
         |  SELECT id, count(*) AS degree FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) t
         |  GROUP BY id)
         |SELECT degree, count(*) AS nodes FROM deg
         |GROUP BY degree ORDER BY degree ASC""".stripMargin,
    "llm_dedup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, n_chars // 100 AS band,
        |         list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.toks, b.toks))), 6) >= 0.8),
        |edges AS (SELECT a_id, b_id FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
        |nodes AS (SELECT DISTINCT a_id AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT reach.id, edges.b_id FROM reach JOIN edges ON reach.r = edges.a_id),
        |cc AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id)
        |SELECT doc_id, cluster, count(*) OVER (PARTITION BY cluster) AS csize
        |FROM cc ORDER BY doc_id ASC""".stripMargin)
}
