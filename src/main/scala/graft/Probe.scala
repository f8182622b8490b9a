package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: stage-level timing probes for the heavy dedup queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val toksRaw = split(col("text"), " ")
    val nsh = greatest(size(toksRaw) - 2, lit(1))
    val shingles = array_distinct(transform(sequence(lit(1), nsh),
      i => concat_ws(" ", slice(toksRaw, i, lit(3)))))
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), expr("n_chars div 100").as("band"),
        sort_array(transform(shingles, s => xxhash64(s))).as("sh"))
    t("ngram encode only")(d.agg(sum(size(col("sh")))).count())
    val a = d.select(col("doc_id").as("a_id"), col("lang"), col("band"), col("sh").as("ash"))
    val b = d.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("band").as("b_band"), col("sh").as("bsh"))
    val paired = a.join(b, col("lang") === col("b_lang") && col("band") === col("b_band") &&
      col("a_id") < col("b_id"))
    t("ngram pairs no jaccard")(paired.select(count(lit(1))).first().getLong(0))
    t("ngram full")(operators.LlmOpsExtra.llmNgramJaccard(spark, sfDir).count())
    t("minhash full")(operators.LlmOps.llmMinhash(spark, sfDir).count())
    t("dedup_near full")(operators.LlmOps.llmDedupNear(spark, sfDir).count())
    t("clusters full")(operators.Clustering.llmDedupClusters(spark, sfDir).count())
    spark.stop()
  }
}
