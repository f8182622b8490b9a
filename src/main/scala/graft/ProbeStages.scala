package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): per-STAGE attribution for declared queries — the
  * stage-level analogue of TimeQ's per-rep line. For each rep of each named
  * query, prints every completed stage's task count, executor run/CPU
  * seconds, shuffle read/write bytes and records, so a slow query's cost
  * lands on a specific exchange/scan instead of a whole job. Not part of
  * the declared surface.
  *
  * Usage: runMain graft.ProbeStages <sfDir> <reps> <query...>
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt; val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Generated-class names WITHOUT the codegen-stage id (round 17):
      // with the default useIdInClassName=true the per-plan stage counter
      // is baked into every generated class NAME, so the same subplan
      // re-planned under a shifted numbering is a janino cache MISS —
      // measured 117 recompiled classes PER INVOCATION on
      // ts_changepoint_deep (0 with the id off; the id exists for
      // debugging readability only). Scale-independent.
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        if (m != null) {
          val nm = si.name.takeWhile(_ != '(').trim
          println(f"STAGE ${si.stageId}%4d $nm%-28s tasks=${si.numTasks}%3d " +
            f"run=${m.executorRunTime / 1e3}%7.2f cpu=${m.executorCpuTime / 1e9}%7.2f " +
            f"srdB=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fM " +
            f"swrB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fM " +
            f"srdR=${m.shuffleReadMetrics.recordsRead}%9d " +
            f"out=${m.outputMetrics.recordsWritten}%9d")
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    names.foreach { n =>
      (1 to reps).foreach { r =>
        Thread.sleep(300)
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"TIME $n rep=$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    }
    spark.stop()
  }
}
