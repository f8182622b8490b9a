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
      // round 18: A/B the codegen class-cache capacity (default 100)
      .config("spark.sql.codegen.cache.maxEntries", sys.env.getOrElse("PROBE_CGCACHE", "100"))
      // round 18: A/B session-artifact classloader isolation (the codegen
      // cache keys on the classloader; cloned sessions — every streaming
      // query run — get a FRESH isolated classloader when this is on)
      .config("spark.sql.artifact.isolation.enabled", sys.env.getOrElse("PROBE_ISO", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PROBE_CGDUMP=1 (round 18): log every whole-stage source the planner
    // generates (DEBUG on WholeStageCodegenExec) so a per-invocation
    // recompile can be root-caused by DIFFING the sources of two reps.
    if (sys.env.get("PROBE_CGDUMP").contains("1")) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.WholeStageCodegenExec",
        org.apache.logging.log4j.Level.DEBUG)
      // expression codegen (projections/predicates/orderings) logs its
      // source from the generator classes in this package
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen",
        org.apache.logging.log4j.Level.DEBUG)
    }
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
