package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: stage timings for llm_minhash (mirrors LlmOps.llmMinhash). */
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
    val toks = sort_array(array_distinct(split(col("text"), " ")))
    val base = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), sort_array(transform(toks, t => xxhash64(t))).as("toks"))
    t("encode only")(base.agg(sum(size(col("toks")))).count())
    val sigs = (0 until 16).map { i =>
      array_min(transform(col("toks"), t => xxhash64(t + lit(i * 1000003)))).as(s"h$i")
    }
    val sig = base.select(col("doc_id") +: sigs: _*)
    t("encode+sig")(sig.agg(sum(col("h0"))).count())
    val bhs = (0 until 4).map { b =>
      xxhash64(col(s"h${4 * b}"), col(s"h${4 * b + 1}"),
        col(s"h${4 * b + 2}"), col(s"h${4 * b + 3}")).as(s"bh$b")
    }
    val sigB = sig.select(col("doc_id") +: bhs: _*)
    val bandCols = (0 until 4).map(b => struct(lit(b).as("band"), col(s"bh$b").as("bh")))
    val bands = sigB
      .select(col("doc_id"), col("bh0"), col("bh1"), col("bh2"),
        explode(array(bandCols: _*)).as("bnd"))
      .select(col("doc_id"), col("bnd.band").as("band"), col("bnd.bh").as("bh"),
        col("bh0"), col("bh1"), col("bh2"))
    val firstSharedBand =
      (col("x.band") === 0) ||
      (col("x.band") === 1 && col("x.bh0") =!= col("y.bh0")) ||
      (col("x.band") === 2 && col("x.bh0") =!= col("y.bh0") && col("x.bh1") =!= col("y.bh1")) ||
      (col("x.band") === 3 && col("x.bh0") =!= col("y.bh0") &&
        col("x.bh1") =!= col("y.bh1") && col("x.bh2") =!= col("y.bh2"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(firstSharedBand)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    t("cand pairs")(cand.select(count(lit(1))).first().getLong(0))
    // size-ratio prefilter selectivity: jac>=0.8 needs min/max sizes >= 0.8
    val sizes = base.select(col("doc_id"), size(col("toks")).as("n"))
    val candSz = cand
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .filter(least(col("na"), col("nb")) * lit(10) >= greatest(col("na"), col("nb")) * lit(8))
    t("cand after size filter")(candSz.select(count(lit(1))).first().getLong(0))
    val ta = base.select(col("doc_id").as("a_id"), col("toks").as("atoks")).hint("shuffle_hash")
    val tb = base.select(col("doc_id").as("b_id"), col("toks").as("btoks")).hint("shuffle_hash")
    val jac = graft.functions.sim.jaccardLongSim(col("atoks"), col("btoks"))
    val full = cand.join(ta, "a_id").join(tb, "b_id")
      .withColumn("jac", round(jac, 6))
      .filter(col("jac") >= 0.8)
      .select("a_id", "b_id", "jac")
    t("verify join (no sort)")(full.select(count(lit(1))).first().getLong(0))
    t("full query")(operators.LlmOps.llmMinhash(spark, sfDir).count())
    spark.stop()
  }
}
