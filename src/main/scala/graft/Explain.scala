package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of selected queries (all
  * queries if no names given) — used to audit that filters/projections
  * reach the parquet scan (PushedFilters/ReadSchema), small dims broadcast,
  * top-k compiles to TakeOrderedAndProject, and hot paths stay inside
  * WholeStageCodegen (SURVEY §4.2; the 100 TB checklist).
  *
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // the pre-materialization chains PlanSnapshotSpec fingerprints — a
    // declared frame that truncates behind a materialize shows only the
    // bounded result scan, so plan audits name "<query>#inner" here
    val inner: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "agg_weighted_median#inner" -> (operators.Aggregates.aggWeightedMedianPlan _),
      "agg_weighted_median#weights" -> (operators.Aggregates.weightedMedianWeights _),
      "agg_pareto#inner" -> (operators.Aggregates.aggParetoPlan _),
      "basket_rules#inner" -> (operators.Analytics2.basketRulesPlan _),
      "graph_pagerank#inner" -> (operators.Clustering.pagerankPlan _),
      "graph_label_prop#inner" -> (operators.Clustering.labelPropPlan _),
      "llm_emb_pq#inner" -> (operators.LlmOpsExtra.llmEmbPqPlan _))
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries.get(n).orElse(inner.get(n)).get(spark, sfDir)
        .explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
