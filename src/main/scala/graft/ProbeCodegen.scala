package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): per-rep NEW-codegen-class count + compiler time
  * for declared queries — separates "first-touch compile" (cache hit on
  * rep 2) from "per-invocation compile" (the generated source embeds a
  * call-specific token, so janino can never cache it). Not declared
  * surface.
  *
  * Usage: runMain graft.ProbeCodegen <sfDir> <reps> <query...>
  */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt; val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.useIdInClassName", sys.env.getOrElse("PROBE_IDCLS", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val histo = {
      val m = Class.forName("org.apache.spark.metrics.source.CodegenMetrics$")
      val inst = m.getField("MODULE$").get(null)
      m.getMethod("METRIC_COMPILATION_TIME").invoke(inst)
        .asInstanceOf[com.codahale.metrics.Histogram]
    }
    val compBean = java.lang.management.ManagementFactory.getCompilationMXBean
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val c0 = histo.getCount; val j0 = compBean.getTotalCompilationTime
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"CODEGEN $n rep=$r $dt%.2f s new_classes=${histo.getCount - c0} " +
          f"jit=${(compBean.getTotalCompilationTime - j0) / 1e3.toDouble}%.2f s")
      }
    }
    spark.stop()
  }
}
