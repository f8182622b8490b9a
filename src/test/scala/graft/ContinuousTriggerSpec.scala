package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Smoke coverage for the one streaming mode StreamingEquivalenceSpec
  * leaves untouched (VERDICT r6 optional ask #8): a long-lived
  * ProcessingTime-trigger query over a file source, fed while running.
  * Every declared stream_* query uses AvailableNow/once semantics (the
  * harness is batch-shaped); this proves the same source/sink plumbing
  * keeps delivering when the trigger is a clock instead of a drain —
  * files appended AFTER the query starts arrive in later micro-batches
  * with nothing dropped or duplicated. */
class ContinuousTriggerSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("ProcessingTime file-source query picks up files appended while running") {
    val root = java.nio.file.Files.createTempDirectory("graft_ct_").toString
    val in = s"$root/in"
    val schema = new StructType().add("id", "long").add("v", "string")
    (1L to 3L).map(i => (i, "first")).toDF("id", "v")
      .write.mode("append").parquet(in)
    val query = spark.readStream.schema(schema).parquet(in)
      .writeStream.format("memory").queryName("ct_smoke")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      query.processAllAvailable()
      val n1 = spark.table("ct_smoke").count()
      assert(n1 === 3L, s"first batch of files should deliver 3 rows, got $n1")
      // feed the RUNNING query a second wave
      (4L to 8L).map(i => (i, "second")).toDF("id", "v")
        .write.mode("append").parquet(in)
      query.processAllAvailable()
      val rows = spark.table("ct_smoke").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq === (1L to 8L),
        s"appended files must arrive exactly once; got ${rows.mkString(",")}")
      // the clock trigger must have produced MULTIPLE micro-batches, not
      // one drain (that would be AvailableNow semantics by accident)
      assert(query.lastProgress != null && query.lastProgress.batchId >= 1,
        s"expected >=2 micro-batches, lastProgress=${query.lastProgress}")
    } finally query.stop()
  }
}
