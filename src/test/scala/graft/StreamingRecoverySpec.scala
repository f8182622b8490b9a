package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{GEvent, GSession, Sessionize}

/** Round-12 crafted sweep #1 (VERDICT r11 task 7): CHECKPOINT-RECOVERY
  * replay on the stateful streaming family. The fixture-driven
  * equivalence suite always delivers each user's events within one run;
  * these tests kill the query BETWEEN micro-batches and resume from the
  * checkpoint, so carried state (open sessions, stream-stream join
  * buffers) must survive a restart to produce the batch answer.
  *
  * The sweep's find: `Sessionize.sessions` ignored its GroupState (fine
  * for the declared batch query, wrong for its "batch or streaming —
  * identical call" claim); `sessionsIncremental` now carries the open
  * session and is pinned here across a MID-SESSION restart.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(1767225600000L + minutes * 60000L)

  /** Crafted stream: user 1's second session SPANS the drop boundary
    * (events at t+80 and t+90 land in drop 0, t+95/t+100 in drop 1 —
    * gaps under 30 min, one session); user 2's drop-1 events open a NEW
    * session (gap over 30 min across the boundary). */
  private val drop0 = Seq(
    GEvent(1L, ts(0), 1L, "view", 1.0), GEvent(2L, ts(10), 1L, "click", 2.0),
    GEvent(3L, ts(80), 1L, "view", 3.0), GEvent(4L, ts(90), 1L, "view", 4.0),
    GEvent(5L, ts(0), 2L, "view", 5.0), GEvent(6L, ts(5), 2L, "click", 6.0))
  private val drop1 = Seq(
    GEvent(7L, ts(95), 1L, "click", 7.0), GEvent(8L, ts(100), 1L, "purchase", 8.0),
    GEvent(9L, ts(120), 2L, "view", 9.0), GEvent(10L, ts(125), 2L, "purchase", 10.0))

  test("sessionsIncremental: open session survives a checkpoint restart mid-session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rec_sess_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rec_ckpt_").toString
    val schema = drop0.toDF().schema
    val emissions = scala.collection.mutable.ArrayBuffer.empty[(Long, GSession)]
    val seq = new java.util.concurrent.atomic.AtomicLong()

    def runOnce(): Unit = {
      val ds = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(dir)
        .as[GEvent]
      val q = Sessionize.sessionsIncremental(ds)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[GSession], _: Long) =>
          val n = seq.incrementAndGet()
          batch.collect().foreach(s => emissions.synchronized { emissions += ((n, s)) })
          ()
        }
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    drop0.toDF().coalesce(1).write.parquet(s"$dir/d0")
    runOnce() // first life of the query
    drop1.toDF().coalesce(1).write.parquet(s"$dir/d1")
    runOnce() // restarted from the checkpoint — OpenSess must restore

    // consumer contract: last emission per (user, session_id) wins
    val last = emissions.synchronized {
      emissions.sortBy(_._1).foldLeft(Map.empty[(Long, Long), GSession]) {
        case (m, (_, s)) => m + ((s.user_id, s.session_id) -> s)
      }
    }
    val batch = Sessionize.sessions((drop0 ++ drop1).toDS()).collect()
      .map(s => (s.user_id, s.session_id) -> s).toMap
    assert(last == batch,
      s"recovered incremental sessions diverge:\n got=$last\n want=$batch")
    // the crafted shape really exercised the boundary: user 1 has 2
    // sessions (the second spanning the restart), user 2 has 2 (the
    // second OPENED after the restart)
    assert(batch.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    assert(batch((1L, 2L)).n == 4L, "spanning session must merge both drops")
  }

  test("sessionsIncremental: last-emission == batch over fixture micro-batches (no restart)") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value").as[GEvent]
      .collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val ms = MemoryStream[GEvent]
    val q = Sessionize.sessionsIncremental(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_inc")
      .outputMode("update").start()
    try {
      evs.grouped(271).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      // memory sink in update mode APPENDS emissions; keep the last per key
      val streamed = spark.table("sess_inc").collect()
        .zipWithIndex
        .map { case (r, i) => (i, (r.getLong(0), r.getLong(1), r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP))) }
        .foldLeft(Map.empty[(Long, Long), (Long, BigDecimal)]) {
          case (m, (_, (u, sid, n, v))) => m + ((u, sid) -> ((n, v)))
        }
      val batch = Sessionize.sessionsFor(spark, sf0001).collect()
        .map(s => (s.user_id, s.session_id) ->
          ((s.n, BigDecimal(s.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream join: build-side state survives a checkpoint restart") {
    val vDir = java.nio.file.Files.createTempDirectory("graft_rec_v_").toString
    val cDir = java.nio.file.Files.createTempDirectory("graft_rec_c_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rec_jck_").toString
    val ev = Seq.empty[GEvent].toDF()
    val schema = ev.schema
    // the view arrives in the query's FIRST life; its matching click only
    // in the SECOND — the join result exists iff view-side state restored
    Seq(GEvent(1L, ts(0), 1L, "view", 1.0), GEvent(2L, ts(1), 2L, "view", 1.0))
      .toDF().coalesce(1).write.parquet(s"$vDir/d0")
    ev.coalesce(1).write.parquet(s"$cDir/d0") // empty click drop

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def runOnce(): Long = {
      val views = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(vDir)
        .withWatermark("ts", "2 hours")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("v_id"))
      val clicks = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(cDir)
        .withWatermark("ts", "2 hours")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val joined = views.join(clicks,
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") < col("v_ts") + expr("INTERVAL 30 MINUTES"))
      var emitted = 0L
      val q = joined.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = batch.select("v_user", "v_id", "c_id").collect()
          got.synchronized {
            got ++= rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          }
          emitted += rows.length
          ()
        }
        .start()
      try q.awaitTermination(120000) finally q.stop()
      emitted
    }

    runOnce() // life 1: views buffered, no clicks yet
    Seq(GEvent(10L, ts(10), 1L, "click", 2.0), // matches view 1 (10 min lag)
        GEvent(11L, ts(90), 2L, "click", 2.0)) // 89 min after view 2: outside window
      .toDF().coalesce(1).write.parquet(s"$cDir/d1")
    runOnce() // life 2: click joins the RESTORED view state
    val afterTwo = got.synchronized(got.toSet)
    assert(afterTwo == Set((1L, 1L, 10L)),
      s"exactly the in-window pair must emit from restored state, got $afterTwo")
    // life 3: nothing new — recovery must not re-emit old matches
    val third = runOnce()
    assert(third == 0L, "restart without new data re-emitted join results")
  }
}
