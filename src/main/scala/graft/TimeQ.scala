package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val traceJobs = sys.env.contains("SPARK_GRAFT_TRACE_JOBS")
    // spill accumulation (round 15, bounded-heap certification): same
    // TaskMetrics counters the bench's per-query columns use, read as
    // deltas around each rep so a constrained-heap TimeQ run shows
    // which rep spilled how much instead of only "survived"
    val spillMem = new java.util.concurrent.atomic.LongAdder()
    val spillDisk = new java.util.concurrent.atomic.LongAdder()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceJobs) {
          val s = js.stageInfos.map(si => s"${si.name.takeWhile(_ != '(').trim}:${si.numTasks}")
            .mkString(" | ")
          println(s"JOB ${js.jobId} stages=${js.stageInfos.size} [$s]")
        }
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { spillMem.add(m.memoryBytesSpilled); spillDisk.add(m.diskBytesSpilled) }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    names.foreach { n =>
      (1 to reps).foreach { r =>
        Thread.sleep(300); val j0 = jobs.get()
        val sm0 = spillMem.sum(); val sd0 = spillDisk.sum()
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"TIME $n rep=$r $dt%.2f s rows=$c jobs=${jobs.get() - j0} " +
          f"spill_mem=${(spillMem.sum() - sm0) / 1e6}%.0fMB spill_disk=${(spillDisk.sum() - sd0) / 1e6}%.0fMB")
      }
    }
    spark.stop()
  }
}
