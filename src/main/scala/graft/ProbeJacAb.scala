package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 17): same-host A/B of the two graph_jaccard_capped
  * formulations at any scale frame — the r16 pk-self-join (census + keep
  * join + join + filter + agg) vs the round-17 clique expansion from
  * per-part sorted arrays — with per-rep spill deltas. Decides which form
  * ships at the 100×/16 g bounded-heap protocol (VERDICT r16 task 3's
  * done-criterion). Not declared surface.
  *
  * Usage: runMain graft.ProbeJacAb <sfDir> <reps>
  */
object ProbeJacAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.useIdInClassName", "false")
      // codegen class cache sized for the suite (round 18 — default 100
      // entries cycles several times over a 323-query run; see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // Session-artifact classloader isolation OFF (round 18): the codegen
      // class cache keys on (classloader, source), and with isolation on
      // every CLONED session — each streaming-query run clones — carries a
      // fresh classloader, so identical generated sources recompile per
      // stream start (measured 10-20 classes/rep on the stream family; 0
      // with this off). This engine registers no per-session artifacts, so
      // isolation buys nothing here at any scale.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spillMem = new java.util.concurrent.atomic.LongAdder()
    val spillDisk = new java.util.concurrent.atomic.LongAdder()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { spillMem.add(m.memoryBytesSpilled); spillDisk.add(m.diskBytesSpilled) }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val cap = 24
    def sp: DataFrame = operators.ProbeAccess.graphPairs(spark, sfDir)
      .select(expr("p DIV 2").as("pk"), expr("(s - 1) DIV 2").as("sk"))
    sp.limit(1).count() // build the memo untimed

    def finish(co: DataFrame, deg: DataFrame): DataFrame =
      co.join(broadcast(deg.select(col("sk").as("s1"), col("d").as("d1"))), "s1")
        .join(broadcast(deg.select(col("sk").as("s2"), col("d").as("d2"))), "s2")
        .select(col("s1"), col("s2"), col("inter"), col("d1"), col("d2"),
          round(col("inter").cast("double") / (col("d1") + col("d2") - col("inter")), 6).as("jacc"))
        .orderBy(col("jacc").desc, col("s1").asc, col("s2").asc)
        .limit(100)

    def joinForm: DataFrame = {
      val keep = sp.groupBy("pk").agg(count(lit(1)).as("dp"))
        .filter(col("dp") <= cap).select("pk")
      val spc = sp.join(keep, "pk")
      val deg = spc.groupBy("sk").agg(count(lit(1)).as("d"))
      val co = spc.select(col("pk"), col("sk").as("s1"))
        .join(spc.select(col("pk"), col("sk").as("s2")), "pk")
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      finish(co, deg)
    }

    def arrayForm: DataFrame = {
      val byPart = sp.groupBy("pk").agg(sort_array(collect_list(col("sk"))).as("ss"))
        .filter(size(col("ss")) <= cap)
      val deg = byPart.select(explode(col("ss")).as("sk"))
        .groupBy("sk").agg(count(lit(1)).as("d"))
      val co = byPart
        .select(col("ss"), posexplode(col("ss")).as(Seq("i", "s1")))
        .select(col("s1"), explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      finish(co, deg)
    }

    // round 18 variants: the capped array form with the (s1,s2) exchange
    // made explicit (no map-side partial agg), and the EXACT forms (no
    // hub cap) in r17 shape (partial agg) vs r18 shape (raw-pair
    // repartition) — the VERDICT r17 task 6 spill A/B.
    def arrayRepartForm: DataFrame = {
      // mirrors the shipped r18 capped form: SIZE-DERIVED pin (structural
      // ×(cap−1)/2 expansion bound), raw-pair (s1,s2) exchange
      val nP = { val n = operators.MemoFrames.scaleParts(spark, sp, (cap - 1) / 2.0)
                 if (n > 0) n else 32 }
      System.err.println(s"JACAB array_repart derived nParts=$nP")
      val byPart = sp.repartition(nP, col("pk"))
        .groupBy("pk").agg(sort_array(collect_list(col("sk"))).as("ss"))
        .filter(size(col("ss")) <= cap)
      val deg = byPart.select(explode(col("ss")).as("sk"))
        .groupBy("sk").agg(count(lit(1)).as("d"))
      val co = byPart
        .select(col("ss"), posexplode(col("ss")).as(Seq("i", "s1")))
        .select(col("s1"), explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
        .repartition(nP, col("s1"), col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      finish(co, deg)
    }
    // pin the pk exchange only — keep the map-side partial agg on (s1,s2)
    def arrayPinForm: DataFrame = {
      val byPart = sp.repartition(32, col("pk"))
        .groupBy("pk").agg(sort_array(collect_list(col("sk"))).as("ss"))
        .filter(size(col("ss")) <= cap)
      val deg = byPart.select(explode(col("ss")).as("sk"))
        .groupBy("sk").agg(count(lit(1)).as("d"))
      val co = byPart
        .select(col("ss"), posexplode(col("ss")).as(Seq("i", "s1")))
        .select(col("s1"), explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      finish(co, deg)
    }
    def exactForm(repart: Boolean): DataFrame = {
      val dega = sp.groupBy("sk").agg(count(lit(1)).as("d"))
      val byPart = sp.repartition(32, col("pk"))
        .groupBy("pk").agg(sort_array(collect_list(col("sk"))).as("ss"))
      val pairs = byPart
        .select(col("ss"), posexplode(col("ss")).as(Seq("i", "s1")))
        .select(col("s1"), explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      val co = (if (repart) pairs.repartition(32, col("s1"), col("s2")) else pairs)
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
      finish(co, dega)
    }

    val which = sys.env.getOrElse("PROBE_JAC_FORMS",
      "join_form,array_form,array_repart,exact_r17,exact_r18")
      .split(",").map(_.trim).toSet
    for ((name, f) <- Seq("join_form" -> (() => joinForm),
                          "array_form" -> (() => arrayForm),
                          "array_pin" -> (() => arrayPinForm),
                          "array_repart" -> (() => arrayRepartForm),
                          "exact_r17" -> (() => exactForm(false)),
                          "exact_r18" -> (() => exactForm(true)))
           if which.contains(name);
         r <- 1 to reps) {
      val sm0 = spillMem.sum(); val sd0 = spillDisk.sum()
      val t0 = System.nanoTime()
      val c = f().count()
      println(f"JACAB $name rep=$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c " +
        f"spill_mem=${(spillMem.sum() - sm0) / 1e6}%.0fMB spill_disk=${(spillDisk.sum() - sd0) / 1e6}%.0fMB")
    }
    spark.stop()
  }
}
