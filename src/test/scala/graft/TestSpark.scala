package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark session startup
  * is ~5 s — per-suite sessions would dominate test time). Config mirrors
  * the driver harness: local[4], shuffle=4, UTC, nanosAsLong. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // GC'd reliable checkpoints (pagerank, dedup clusters — eager at
      // query construction, so every suite writes them) delete their
      // tmpfs files instead of accumulating across test runs
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // static conf — needed by BucketingSpec's saveAsTable, kept out of
      // the repo tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001  = "/root/testdata/sf0.01"
}
