package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r10 task 3): A/B the memoized (src,dst,deg,n) arc
  * PARQUET (current — supersteps re-shuffle the arc side in-job) against a
  * BUCKETED arc table (bucketBy(32, src) — supersteps join bucket-aligned
  * with zero arc shuffle). Measures warm pagerank/label_prop shapes and
  * job counts under both; the winner ships, the loser's numbers land in
  * PLANS.md. Not part of the declared surface. */
object ProbeGraphBucket {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_probe_wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String, reps: Int)(body: => Long): Unit =
      (1 to reps).foreach { r =>
        Thread.sleep(300); val j0 = jobs.get(); val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"PROBE $name rep=$r $dt%.2f s rows=$n jobs=${jobs.get() - j0}")
      }

    // ---- variant A: current product path (memo parquet arcs) ----
    // warm the memo untimed
    SparkEntry.queries("graph_pagerank")(spark, sfDir).count()
    time("A_pagerank", 3)(SparkEntry.queries("graph_pagerank")(spark, sfDir).count())
    time("A_labelprop", 3)(SparkEntry.queries("graph_label_prop")(spark, sfDir).count())

    // ---- variant B: bucketed arc table ----
    val sp = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val ed0 = sp.select(col("p").as("src"), col("s").as("dst"))
      .unionAll(sp.select(col("s").as("src"), col("p").as("dst")))
    val outdeg = ed0.groupBy("src").agg(count(lit(1)).as("deg"))
    val nAgg = ed0.agg(countDistinct("src").as("n"))
    spark.sql("DROP TABLE IF EXISTS graft_probe_arcs_b")
    val tB0 = System.nanoTime()
    ed0.join(outdeg, "src").crossJoin(broadcast(nAgg))
      .write.mode("overwrite")
      .option("path", "/tmp/graft_probe_wh/arcs_b")
      .bucketBy(32, "src")
      .saveAsTable("graft_probe_arcs_b")
    println(f"PROBE B_build ${(System.nanoTime() - tB0) / 1e9}%.2f s")

    def pagerankB(): Long = {
      val edges = spark.table("graft_probe_arcs_b")
      var ranks = edges
        .select(col("dst"), (lit(1.0) / col("n") / col("deg")).as("c"), col("n"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("inflow"), max("n").as("n"))
        .select(col("node"), (lit(0.15) / col("n") + lit(0.85) * col("inflow")).as("pr"))
      for (_ <- 1 to 2) {
        ranks = ranks
          .join(edges, col("node") === col("src"))
          .select(col("dst"), (col("pr") / col("deg")).as("c"), col("n"))
          .groupBy(col("dst").as("node")).agg(sum("c").as("inflow"), max("n").as("n"))
          .select(col("node"), (lit(0.15) / col("n") + lit(0.85) * col("inflow")).as("pr"))
      }
      val top = ranks
        .select(when(col("node") % 2 === 0, concat(lit("p"), (col("node") / 2).cast("long")))
          .otherwise(concat(lit("s"), ((col("node") - 1) / 2).cast("long"))).as("node"),
          round(col("pr"), 6).as("pr"))
        .orderBy(col("pr").desc, col("node").asc).limit(20)
      graft.operators.MemoFrames.materialize(spark, "probe_pr_top", top)
        .orderBy(col("pr").desc, col("node").asc).count()
    }
    def labelPropB(): Long = {
      val edges = spark.table("graft_probe_arcs_b").select("src", "dst")
      var labels = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      for (_ <- 1 to 2) {
        labels = labels
          .join(edges, col("node") === col("src"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst").as("node"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("lbl"))
      }
      val top = labels.groupBy("lbl").agg(count(lit(1)).as("n_nodes"))
        .select(when(col("lbl") % 2 === 0, concat(lit("p"), (col("lbl") / 2).cast("long")))
          .otherwise(concat(lit("s"), ((col("lbl") - 1) / 2).cast("long"))).as("community"),
          col("n_nodes"))
        .orderBy(col("n_nodes").desc, col("community").asc).limit(20)
      graft.operators.MemoFrames.materialize(spark, "probe_lp_top", top)
        .orderBy(col("n_nodes").desc, col("community").asc).count()
    }
    // run both AQE-off like the product path (one materialize job each)
    time("B_pagerank", 3)(graft.operators.MemoFrames.noAqe(spark)(pagerankB()))
    time("B_labelprop", 3)(graft.operators.MemoFrames.noAqe(spark)(labelPropB()))

    // plan check: does the bucketed superstep drop the arc exchange?
    val edges = spark.table("graft_probe_arcs_b")
    val step = edges
      .select(col("dst"), (lit(1.0) / col("n") / col("deg")).as("c"), col("n"))
      .groupBy(col("dst").as("node")).agg(sum("c").as("inflow"), max("n").as("n"))
      .join(edges, col("node") === col("src"))
    val plan = graft.operators.MemoFrames.noAqe(spark)(
      step.queryExecution.executedPlan.toString)
    println("PROBE exchanges_in_superstep=" +
      "Exchange".r.findAllIn(plan).length)
    spark.sql("DROP TABLE IF EXISTS graft_probe_arcs_b")
    spark.stop()
  }
}
