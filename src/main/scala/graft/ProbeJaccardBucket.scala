package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: graph_jaccard's self-join on the part key — current memo
  * parquet (both sides shuffle to hash(pk)) vs a pair table bucketed on p
  * (zero-shuffle self-join; the (s1,s2) reduce shuffle remains — that is
  * the Σdeg² work itself). */
object ProbeJaccardBucket {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_probe_wh2")
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
    SparkEntry.queries("graph_jaccard")(spark, sfDir).count() // warm memo
    time("A_jaccard", 3)(SparkEntry.queries("graph_jaccard")(spark, sfDir).count())

    spark.sql("DROP TABLE IF EXISTS graft_probe_pairs_b")
    val t0 = System.nanoTime()
    graft.operators.MemoFrames.noAqe(spark) {
      Tables.lineitem(spark, sfDir)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
        .distinct()
        .repartition(32, col("p"))
        .write.mode("overwrite").option("path", "/tmp/graft_probe_wh2/pairs_b")
        .bucketBy(32, "p").saveAsTable("graft_probe_pairs_b")
    }
    println(f"PROBE B_build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def jaccB(): Long = {
      val sp = spark.table("graft_probe_pairs_b")
      val deg = sp.groupBy("sk").agg(count(lit(1)).as("d"))
      val co = sp.select(col("p"), col("sk").as("s1"))
        .join(sp.select(col("p"), col("sk").as("s2")), "p")
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      co.join(broadcast(deg.select(col("sk").as("s1"), col("d").as("d1"))), "s1")
        .join(broadcast(deg.select(col("sk").as("s2"), col("d").as("d2"))), "s2")
        .select(col("s1"), col("s2"), col("inter"), col("d1"), col("d2"),
          round(col("inter").cast("double") / (col("d1") + col("d2") - col("inter")), 6).as("jacc"))
        .orderBy(col("jacc").desc, col("s1").asc, col("s2").asc)
        .limit(100).count()
    }
    time("B_jaccard", 3)(jaccB())
    spark.sql("DROP TABLE IF EXISTS graft_probe_pairs_b")
    spark.stop()
  }
}
