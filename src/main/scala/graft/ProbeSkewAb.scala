package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-skew-join vs manual-salt A/B (round 15, VERDICT r14 task 5): the
  * skew operators' scaladoc claims AQE is the first line of defense and
  * the manual salt the fallback — this probe puts numbers behind that
  * sentence on frames whose skew WE control, since no driver fixture has
  * a pathological key.
  *
  * Frame: N-million-row fact where a single hot key owns `share` of all
  * rows and the rest spread uniformly over 1 M keys; 1 M-row dim joined
  * on that key. Both written to tmpfs parquet first so every variant
  * reads the same files with real scan stats. Broadcast is disabled for
  * the plain variants (autoBroadcastJoinThreshold=-1): at 100 TB the dim
  * outgrows the broadcast budget, and a broadcast join has no shuffle to
  * skew — the SMJ/shuffle-hash path is the one AQE's skew splitter and
  * the manual salt both target.
  *
  * Variants, each run twice with the reported number = rep 2 (warm —
  * same TimeQ convention as every STRESS.md table):
  *   aqe_on   — plain join, spark.sql.adaptive.skewJoin.enabled=true
  *   aqe_off  — plain join, skew splitter disabled (the pre-AQE world)
  *   salted   — skew splitter disabled, Skew.skewSaltedJoin's shape:
  *              fact salted into 8 buckets, dim replicated 8×
  *
  * Usage: runMain graft.ProbeSkewAb <rowsMillions> <share1> [share2 ...]
  */
object ProbeSkewAb {
  def main(args: Array[String]): Unit = {
    val rowsM = args(0).toInt
    val shares = args.drop(1).map(_.toDouble)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_skewab"
      else "/tmp/graft_skewab"
    val n = rowsM * 1000000L
    val dimPath = s"$base/dim.parquet"
    spark.range(1000000L)
      .select(col("id").as("d_key"),
        concat(lit("SEG"), pmod(col("id"), lit(5))).as("d_seg"),
        (col("id") % 997).cast("double").as("d_w"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    def fact(share: Double): DataFrame = {
      // cache key carries BOTH the row count and the share, the latter
      // via Double.toString (ADVICE r15, tightened in the round-16
      // self-review): the old int(share*100) key ignored rowsMillions
      // and truncated 0.015 onto 0.01 — and a scaled-int key of ANY
      // precision keeps a residual truncation class one decimal further
      // down. Double.toString is canonical per distinct value, so the
      // key is collision-free; sanitize it to a filesystem-safe token.
      val shareKey = share.toString.map(c => if (c.isLetterOrDigit) c else '_')
      val path = f"$base/fact_${rowsM}%dm_$shareKey%s.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        // deterministic: row i is hot iff i mod 1000 < share*1000
        spark.range(n)
          .select(
            when(pmod(col("id"), lit(1000L)) < lit((share * 1000).toLong), lit(42L))
              .otherwise(pmod(xxhash64(col("id")), lit(1000000L))).as("f_key"),
            (col("id") % 10000).cast("double").as("f_val"))
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    def shape(f: DataFrame, d: DataFrame, keyExpr: (DataFrame, DataFrame) => org.apache.spark.sql.Column): Long =
      f.join(d, keyExpr(f, d))
        .groupBy("d_seg")
        .agg(count(lit(1)).as("cnt"), sum(col("f_val") * col("d_w")).as("wsum"))
        .count()

    def timed(label: String, conf: Map[String, String])(body: => Long): Double = {
      val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        var last = 0.0
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          val rows = body
          last = (System.nanoTime() - t0) / 1e9
          println(f"SKEWAB $label rep=$rep $last%.2f s rows=$rows")
        }
        last
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val noBcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    shares.foreach { share =>
      val f = fact(share)
      println(s"SKEWAB === share=$share (${(n * share).toLong} rows on one key of $n) ===")
      val aqeOn = timed("aqe_on ", noBcast +
        ("spark.sql.adaptive.skewJoin.enabled" -> "true")) {
        shape(f, dim, (a, b) => a("f_key") === b("d_key"))
      }
      val aqeOff = timed("aqe_off", noBcast +
        ("spark.sql.adaptive.skewJoin.enabled" -> "false")) {
        shape(f, dim, (a, b) => a("f_key") === b("d_key"))
      }
      val salted = timed("salted ", noBcast +
        ("spark.sql.adaptive.skewJoin.enabled" -> "false")) {
        val salts = 8
        val fs = f.withColumn("_salt", pmod(xxhash64(col("f_val")), lit(salts)))
        val ds = dim.withColumn("_salt",
          explode(array((0 until salts).map(lit(_)): _*)))
        fs.join(ds, fs("f_key") === ds("d_key") &&
            fs("_salt") === ds("_salt").cast("bigint"))
          .groupBy("d_seg")
          .agg(count(lit(1)).as("cnt"), sum(col("f_val") * col("d_w")).as("wsum"))
          .count()
      }
      println(f"SKEWAB RESULT share=$share aqe_on=$aqeOn%.2f aqe_off=$aqeOff%.2f salted=$salted%.2f")
    }
    spark.stop()
  }
}
