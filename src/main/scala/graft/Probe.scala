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
    // per-phase job counter (async listener bus — drained with a short
    // sleep before each read; fine for a dev probe)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    def t(name: String)(f: => Long): Unit = {
      Thread.sleep(300); val j0 = jobs.get()
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBE $name%-28s $dt%8.2f s  rows=$n jobs=${jobs.get() - j0}")
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
    // stage breakdown of the clusters pipeline (mirrors the operator's
    // round-8 materialize-based flow — keep in sync with Clustering)
    import operators.MemoFrames
    var ed: org.apache.spark.sql.DataFrame = null
    t("cl: pairs mat")({
      val pm = MemoFrames.materialize(spark, "probe_pairs",
        operators.LlmOps.nearDupPairs(spark, sfDir).select("a_id", "b_id"))
      ed = pm.unionAll(pm.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      ed.count()
    })
    var l0: org.apache.spark.sql.DataFrame = null
    t("cl: lbl0 mat")({ l0 = MemoFrames.materialize(spark, "probe_lbl0", ed.groupBy(col("a_id").as("id")).agg(least(min(col("b_id")), col("a_id")).as("lbl"))); l0.count() })
    var epp: org.apache.spark.sql.DataFrame = null
    t("cl: contract mat")({
      val half = ed.join(l0, ed("b_id") === l0("id")).select(ed("a_id").as("a_id"), col("lbl").as("b_lbl"))
      epp = MemoFrames.materialize(spark, "probe_ep", half.join(l0, half("a_id") === l0("id")).select(col("lbl").as("a_id"), col("b_lbl").as("b_id"))
        .filter(col("a_id") =!= col("b_id")).distinct())
      epp.count()
    })
    var lbls = epp.groupBy(col("a_id").as("id")).agg(least(min(col("b_id")), col("a_id")).as("lbl"))
    var conv = false; var it = 0
    while (!conv && it < 50) {
      val nbr = epp.join(lbls, epp("b_id") === lbls("id"))
        .select(epp("a_id").as("id"), col("lbl"), lit(Long.MaxValue).as("prev"))
      val nx = lbls.select(col("id"), col("lbl"), col("lbl").as("prev")).unionAll(nbr)
        .groupBy("id").agg(min("lbl").as("lbl"), min("prev").as("prev"))
      it += 1
      if (it == 4 || (it > 4 && it % 2 == 0)) {
        t(s"cl: round $it mat+probe")({
          val ck = MemoFrames.materialize(spark, s"probe_round$it", nx)
          conv = ck.filter(col("lbl") < col("prev")).limit(1).count() == 0L
          lbls = ck.select("id", "lbl"); 0L
        })
      } else lbls = nx.select("id", "lbl")
    }
    println(s"PROBE iterations=$it")
    t("cl: final compose")({
      val roots = lbls.select(col("id").as("r_id"), col("lbl").as("root"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
      l0.join(roots, col("lbl") === col("r_id"), "left")
        .select(col("id").as("doc_id"), coalesce(col("root"), col("lbl")).as("cluster"))
        .withColumn("csize", count(lit(1)).over(w))
        .orderBy(col("doc_id").asc).count()
    })
    spark.stop()
  }
}
