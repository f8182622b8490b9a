package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MemoFrames, ScaleIdioms}

/** Dev probe (VERDICT r10 task 4): the reverted two-level-rank swap for
  * rfm_segments / cust_migration, in the TWO-WRITE shape (customer-grain
  * frame materialized AQE-off once, rank chains run off the FILE — the
  * agg_pareto restructure that beat the r10 lazy-frame attempt's 15-stage
  * serialization), A/B'd against the shipped global-ntile window form at
  * fixture scale AND the StressGen 10× frame. Whichever side loses at a
  * given scale, the numbers land in STRESS.md and the flip trigger in the
  * operators' scaladocs. */
object ProbeRfmScale {

  /** Two-write rfm_segments: same output contract as the shipped form. */
  def rfmFrameB(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val ref = broadcast(o.agg(max(to_date(col("o_orderdate"))).as("ref")))
    val cust = o.groupBy("o_custkey")
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        round(round(sum("o_totalprice"), 2) * 100, 0).cast("long").as("mon_cents"))
      .crossJoin(ref)
      .select(col("o_custkey"), datediff(col("ref"), col("last_day")).as("rec_days"),
        col("freq"), col("mon_cents"))
    val f = MemoFrames.materialize(spark, "probe_rfm_cust", cust) // write 1
    val n = broadcast(f.agg(count(lit(1)).as("__total")))
    // each axis: two-level rank over a bin aligned with its order column
    // (rec_days day-grain; freq count-grain; mon_cents in $1000 bands)
    def axis(sel: DataFrame => DataFrame, bin: Column, binAsc: Boolean,
        ord: Seq[Column], out: String): DataFrame =
      ScaleIdioms.twoLevelRank(sel(f), bin, binAsc, ord, None, "merge")
        .crossJoin(n)
        .select(col("o_custkey"),
          ScaleIdioms.ntileFromRank(5, col("rn"), col("__total")).as(out))
    val r = axis(_.select("o_custkey", "rec_days"), col("rec_days"), true,
      Seq(col("rec_days").asc, col("o_custkey").asc), "r")
    val fq = axis(_.select("o_custkey", "freq"), col("freq"), false,
      Seq(col("freq").desc, col("o_custkey").asc), "f")
    val m = axis(_.select("o_custkey", "mon_cents"), expr("mon_cents DIV 100000"),
      false, Seq(col("mon_cents").desc, col("o_custkey").asc), "m")
    f.join(r, "o_custkey").join(fq, "o_custkey").join(m, "o_custkey")
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("customers"),
        min("rec_days").cast("long").as("min_rec"),
        max("rec_days").cast("long").as("max_rec"),
        round(avg("freq"), 4).as("avg_freq"),
        (round(avg("mon_cents"), 0) / 100).as("avg_monetary"))
      .filter(col("customers") >= 5)
      .orderBy(col("r").asc, col("f").asc, col("m").asc)
  }

  /** Two-write cust_migration: same output contract as the shipped form. */
  def migrFrameB(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"),
      year(col("o_orderdate")).as("yr"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    def quintiles(pred: Column => Column, name: String): DataFrame = {
      val per = MemoFrames.materialize(spark, s"probe_migr_$name",
        o.filter(pred(col("yr"))).groupBy("o_custkey").agg(sum("cents").as("rev")))
      val n = broadcast(per.agg(count(lit(1)).as("__total")))
      ScaleIdioms.twoLevelRank(per, expr("rev DIV 1000000"), false,
          Seq(col("rev").desc, col("o_custkey").asc), None, "merge")
        .crossJoin(n)
        .select(col("o_custkey"),
          ScaleIdioms.ntileFromRank(5, col("rn"), col("__total"))
            .cast("string").as(name))
    }
    val early = quintiles(_ <= 1997, "q_early")
    val late = quintiles(_ >= 1999, "q_late")
    early.join(late, Seq("o_custkey"), "full_outer")
      .select(coalesce(col("q_early"), lit("none")).as("q_early"),
        coalesce(col("q_late"), lit("none")).as("q_late"))
      .groupBy("q_early", "q_late").agg(count(lit(1)).as("customers"))
      .orderBy(col("q_early").asc, col("q_late").asc)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
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

    // ---- A: shipped window forms ----
    time("A_rfm", 3)(SparkEntry.queries("rfm_segments")(spark, sfDir).count())
    time("A_migr", 3)(SparkEntry.queries("cust_migration")(spark, sfDir).count())

    // ---- B: two-write two-level-rank forms ----
    def rfmB(): Long =
      MemoFrames.materialize(spark, "probe_rfm_out", rfmFrameB(spark, sfDir))
        .orderBy(col("r").asc, col("f").asc, col("m").asc).count()
    def migrB(): Long =
      MemoFrames.materialize(spark, "probe_migr_out", migrFrameB(spark, sfDir))
        .orderBy(col("q_early").asc, col("q_late").asc).count()
    time("B_rfm", 3)(MemoFrames.noAqe(spark)(rfmB()))
    time("B_migr", 3)(MemoFrames.noAqe(spark)(migrB()))

    // equality audit at this scale: the two forms must agree row-for-row
    def checksum(df: DataFrame): String =
      df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")).as("h"),
        count(lit(1)).as("n")).head().toString
    println("PROBE rfm_eq window=" +
      checksum(SparkEntry.queries("rfm_segments")(spark, sfDir)) +
      " twolevel=" + checksum(rfmFrameB(spark, sfDir)))
    println("PROBE migr_eq window=" +
      checksum(SparkEntry.queries("cust_migration")(spark, sfDir)) +
      " twolevel=" + checksum(migrFrameB(spark, sfDir)))
    spark.stop()
  }
}
