package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: stage timings for llm_minhash. Every stage DataFrame comes
  * from LlmOps' own private[graft] stage builders (minhashTokenIds /
  * minhashBands / minhashCandidates), so the probe can never drift from
  * the operator it profiles. */
object ProbeMinhash {
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
    val base = operators.LlmOps.minhashTokenIds(spark, sfDir)
    t("encode only")(base.agg(sum(size(col("toks")))).count())
    val bands = operators.LlmOps.minhashBands(spark, sfDir)
    t("encode+sig+bands")(bands.agg(sum(col("bh"))).count())
    val cand = operators.LlmOps.minhashCandidates(bands)
    t("cand pairs (post filters)")(cand.select(count(lit(1))).first().getLong(0))
    t("full query")(operators.LlmOps.llmMinhash(spark, sfDir).count())
    spark.stop()
  }
}
