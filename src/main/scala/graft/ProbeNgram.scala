package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: stage probes for llm_ngram_jaccard's pair-verify path. */
object ProbeNgram {
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
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"), col("lang"), expr("n_chars div 100").as("band"),
        sort_array(transform(shingles, s => xxhash64(s))).as("sh"))
    d.cache()
    val stats = d.agg(count(lit(1)), avg(size(col("sh"))), max(size(col("sh")))).head()
    println(s"PROBE docs=${stats.getLong(0)} avg_sh=${stats.getDouble(1)} max_sh=${stats.getInt(2)}")
    // blocked pair count (oracle pair space)
    val bc = d.groupBy("lang", "band").agg(count(lit(1)).as("k"))
      .agg(sum(expr("k*(k-1) div 2"))).head().getLong(0)
    println(s"PROBE blocked_pairs=$bc")
    // inverted-index pair stream size: per (block, shingle) df, sum df*(df-1)/2
    val occ = d.select(col("id"), col("lang"), col("band"), explode(col("sh")).as("h"))
    val dfAgg = occ.groupBy("lang", "band", "h").agg(count(lit(1)).as("df"))
    val strm = dfAgg.agg(sum(expr("df*(df-1) div 2")), max("df"), count(lit(1))).head()
    println(s"PROBE idx_pair_stream=${strm.getLong(0)} max_df=${strm.getLong(1)} distinct_block_shingles=${strm.getLong(2)}")
    t("current full")(operators.LlmOpsExtra.llmNgramJaccard(spark, sfDir).count())
    t("current full rep2")(operators.LlmOpsExtra.llmNgramJaccard(spark, sfDir).count())
    // inverted-index variant: count shared shingles per candidate pair
    val l = occ.select(col("id").as("a_id"), col("lang"), col("band"), col("h"))
    val r = occ.select(col("id").as("b_id"), col("lang").as("rl"), col("band").as("rb"), col("h").as("rh"))
    val inter = l.join(r, col("h") === col("rh") && col("lang") === col("rl") &&
        col("band") === col("rb") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    val sizes = d.select(col("id"), size(col("sh")).cast("bigint").as("n"))
    val joined = inter
      .join(sizes.select(col("id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jac"))
      .filter(col("jac") >= 0.3)
    t("inverted-index variant")(joined.count())
    t("inverted-index rep2")(joined.count())
    spark.stop()
  }
}
