package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): A/B declared queries across shuffle-partition
  * counts — quantifies how much of each heavy query is per-task/stage
  * fixed cost at partitions=32 vs a size-appropriate count for its
  * actual shuffle bytes. Informs the scale-adaptive partition derivation
  * (guide §2: size partitions by bytes, not a constant). Not declared
  * surface.
  *
  * Usage: runMain graft.ProbeParts <sfDir> <query...>
  */
object ProbeParts {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args.drop(1)
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    // warm artifacts + codegen untimed
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    Seq(32, 8, 4, 2).foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      names.foreach { n =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE p=$p%-3d $n%-26s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
      }
    }
    spark.stop()
  }
}
