package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): A/B AQE advisory partition size (with
  * parallelismFirst=false) across declared queries — finds the advisory
  * that keeps the overhead win on artifact-scale exchanges without
  * serializing partitioned writes / SMJ sorts. Not declared surface.
  *
  * Usage: runMain graft.ProbeAdvisory <sfDir> <query...>
  */
object ProbeAdvisory {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count()) // warm
    for (adv <- Seq("64m", "8m", "2m", "1m", "256k")) {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      names.foreach { n =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE adv=$adv%-4s $n%-24s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
      }
    }
    spark.stop()
  }
}
