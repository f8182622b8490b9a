package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 17): isolate the per-row cost of scanning a memoized
  * pair file vs aggregating it — the ProbeStages trace showed a bare
  * 591k-row count-per-key partial costing ~9.6 CPU-s (16 µs/row), ~100×
  * a columnar hash-agg's expected cost, and that constant multiplies into
  * every memo consumer. Times each shape 3× warm. Not declared surface.
  */
object ProbeScanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sp = graft.operators.ProbeAccess.graphPairs(spark, sfDir)
    sp.count() // build memo untimed
    def time(name: String)(body: => Unit): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime(); body
      println(f"PROBE $name rep=$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("scan_count")(sp.count())
    time("scan_sum")(sp.agg(sum("p")).collect())
    time("deg_agg")(sp.groupBy("s").agg(count(lit(1))).agg(sum("count(1)")).collect())
    time("deg_agg_1part") {
      sp.coalesce(1).groupBy("s").agg(count(lit(1))).agg(sum("count(1)")).collect()
    }
    val plain = sp.select(expr("p DIV 2").as("pk"), expr("(s - 1) DIV 2").as("sk"))
    time("keys_agg")(plain.groupBy("pk").agg(count(lit(1))).agg(sum("count(1)")).collect())
    spark.stop()
  }
}
