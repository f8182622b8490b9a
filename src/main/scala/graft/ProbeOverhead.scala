package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): the fixed-cost ladder — empty job, 1-task job,
  * 32-task job, 2-stage shuffle at 1/8/32 partitions — to price the
  * per-job / per-stage / per-task constants the suite's 323 queries each
  * pay a few of. Not declared surface. */
object ProbeOverhead {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String, reps: Int = 5)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-24s min=${ts.min}%.4f med=${ts.sorted.apply(reps / 2)}%.4f max=${ts.max}%.4f")
    }
    time("rdd_1task")(sc.parallelize(1 to 10, 1).count())
    time("rdd_32task")(sc.parallelize(1 to 320, 32).count())
    time("rdd_256task")(sc.parallelize(1 to 2560, 256).count())
    time("sql_1task")(spark.range(0, 10, 1, 1).count())
    time("sql_32task")(spark.range(0, 320, 1, 32).count())
    val df = spark.range(0, 100000, 1, 32).selectExpr("id % 97 as k", "id as v")
    time("shuffle_32p")(df.groupBy("k").sum("v").collect())
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("shuffle_8p")(df.groupBy("k").sum("v").collect())
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    time("shuffle_1p")(df.groupBy("k").sum("v").collect())
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // AQE on (default) vs off for a 2-exchange plan
    val df2 = spark.range(0, 100000, 1, 32).selectExpr("id % 97 as k", "id as v")
    time("twoexch_aqe_on")(df2.groupBy("k").sum("v").orderBy("k").collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("twoexch_aqe_off")(df2.groupBy("k").sum("v").orderBy("k").collect())
    spark.stop()
  }
}
