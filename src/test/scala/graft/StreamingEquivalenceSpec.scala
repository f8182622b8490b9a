package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** SURVEY §5.2.4 — the batch/stream unification promise: the SAME
  * transformations declared in graft.operators.Streaming produce the same
  * results when run incrementally under Structured Streaming. Covers what
  * the batch-mode oracle can't: micro-batch incremental state,
  * session_window, watermark late-data drops, and the file-source
  * incremental load that models the reference's serverless trigger loop. */
class StreamingEquivalenceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fixtureEvents: Seq[Ev] =
    Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq

  test("tumbling-window counts: incremental == batch") {
    implicit val ctx = spark.sqlContext
    val evs = fixtureEvents
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try {
      evs.grouped(400).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("tumb")
        .select($"window.start".as("wstart"), $"event_type", $"n")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = evs.toDF()
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"window.start".as("wstart"), $"event_type", $"n")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("windowed arg-max: incremental == batch (struct-max state merges)") {
    implicit val ctx = spark.sqlContext
    val evs = fixtureEvents
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(max(struct($"value", $"event_id")).as("best"))
      .writeStream.format("memory").queryName("argmax").outputMode("complete").start()
    try {
      evs.grouped(150).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("argmax")
        .select($"window.start", $"event_type", $"best.event_id")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = operators.Streaming.streamArgmax(spark, sf0001)
        .select($"wstart", $"event_type", $"peak_event")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream_topk: bounded-state typed aggregate, incremental == native batch exec") {
    implicit val ctx = spark.sqlContext
    val evs = fixtureEvents
    val ms = MemoryStream[Ev]
    val agg = new graft.streaming.StreamTopK(3).toColumn
    val q = ms.toDS()
      .groupByKey(e => (Timestamp.valueOf(e.ts.toLocalDateTime
        .withMinute(0).withSecond(0).withNano(0)), e.event_type))
      .mapValues(e => (e.value, e.event_id))
      .agg(agg.name("top"))
      .writeStream.format("memory").queryName("stopk").outputMode("complete").start()
    try {
      evs.grouped(250).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("stopk")
        .collect().flatMap { r =>
          val key = r.getStruct(0)
          r.getSeq[org.apache.spark.sql.Row](1).map(e =>
            (key.get(0).toString, key.getString(1), e.getDouble(0), e.getLong(1)))
        }.toSet
      val batch = operators.Streaming.streamTopk(spark, sf0001)
        // undo the declared query's display round: the streamed side
        // carries raw stored doubles
        .collect().map(r => (r.get(0).toString, r.getString(1),
          r.getDouble(3), r.getLong(2))).toSet
      // compare on (window, type, round(value, 2), id) — both sides' values
      // are the same stored doubles, the declared output just rounds them
      val streamedR = streamed.map { case (w, t, v, id) =>
        (w, t, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP), id) }
      val batchR = batch.map { case (w, t, v, id) =>
        (w, t, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP), id) }
      assert(streamedR === batchR)
      assert(streamedR.nonEmpty)
    } finally q.stop()
  }

  test("streaming dropDuplicates: re-delivered events counted once") {
    implicit val ctx = spark.sqlContext
    val evs = fixtureEvents.take(200)
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .dropDuplicates("event_id")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dedup").outputMode("complete").start()
    try {
      ms.addData(evs); q.processAllAvailable()
      ms.addData(evs.take(50)); q.processAllAvailable() // re-delivery
      val total = spark.table("dedup").agg(sum("n")).head().getLong(0)
      assert(total === 200L)
    } finally q.stop()
  }

  test("stream-static join: incremental == batch (no stream-side state)") {
    implicit val ctx = spark.sqlContext
    val evs = fixtureEvents
    val dim = Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_mktsegment")
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ssjoin").outputMode("complete").start()
    try {
      evs.grouped(400).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("ssjoin")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = operators.Streaming.streamJoinStatic(spark, sf0001)
        .select($"hour", $"c_mktsegment", $"n")
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream interval join: incremental == batch") {
    implicit val ctx = spark.sqlContext
    val evs = fixtureEvents
    val vs = evs.filter(_.event_type == "view")
    val cs = evs.filter(_.event_type == "click")
    val msV = MemoryStream[Ev]
    val msC = MemoryStream[Ev]
    val views = msV.toDF().select($"user_id".as("v_user"), $"ts".as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val clicks = msC.toDF().select($"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val q = views.join(clicks,
        $"v_user" === $"c_user" &&
        $"c_ts" >= $"v_ts" && $"c_ts" < $"v_ts" + expr("INTERVAL 30 MINUTES"))
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      vs.grouped(300).zipAll(cs.grouped(300), Nil, Nil).foreach { case (v, c) =>
        if (v.nonEmpty) msV.addData(v)
        if (c.nonEmpty) msC.addData(c)
        q.processAllAvailable()
      }
      val streamed = spark.table("ssj")
        .select($"v_user", $"v_ts".cast("string"), $"c_ts".cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val batchEv = evs.toDF()
      val bv = batchEv.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), $"ts".as("v_ts"))
      val bc = batchEv.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      val batch = bv.join(bc,
          $"v_user" === $"c_user" &&
          $"c_ts" >= $"v_ts" && $"c_ts" < $"v_ts" + expr("INTERVAL 30 MINUTES"))
        .select($"v_user", $"v_ts".cast("string"), $"c_ts".cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty, "attribution join must attribute something")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer agrees with gaps-and-islands") {
    val stateful = graft.streaming.Sessionize.sessionsFor(spark, sf0001)
      .select($"user_id", $"session_id", $"n", round($"value", 2).as("val"),
        $"s_start", $"s_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.get(4).toString, r.get(5).toString)).toSet
    val gi = operators.Streaming.streamSession(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.get(4).toString, r.get(5).toString)).toSet
    assert(stateful === gi)
  }

  test("streaming dropDuplicatesWithinWatermark drops re-delivered events") {
    implicit val ctx = spark.sqlContext
    def ev(id: Long, t: String) = Ev(id, Timestamp.valueOf(t), 1L, "view", 1.0)
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .writeStream.format("memory").queryName("wmdedup").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      // duplicate of event 1 re-delivered within the watermark → dropped
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(3, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      assert(spark.table("wmdedup").count() === 3)
    } finally q.stop()
  }

  test("declared stream_dedup_watermark census equals the batch dedup census") {
    // the DECLARED query stages real files and runs a real AvailableNow
    // stream; its post-dedup census must equal stream_dedup's batch answer
    // (both equal the plain events census — re-deliveries are exact copies)
    val ddw = operators.Streaming.queries("stream_dedup_watermark")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = operators.Streaming.queries("stream_dedup")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(ddw === batch)
  }

  test("declared stream_recovery: two lives on one checkpoint equal the batch census") {
    // life 1 sees only the first half of the day drops; life 2 is a NEW
    // query instance on the SAME checkpoint that must restore the agg
    // state and process only the new files — the declared result is the
    // post-recovery complete census, which must equal the plain batch
    // aggregate over ALL events (the same equality the DuckDB oracle
    // checks at sf0.01)
    val recovered = operators.Streaming.queries("stream_recovery")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val"))
      .orderBy(col("day").asc, col("event_type").asc)
      .collect().map(_.toSeq).toSeq
    assert(recovered === batch)
    // the split really was mid-backlog: the fixture spans many days, so
    // life 1 cannot have seen everything
    val nDays = Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    assert(nDays >= 2, s"fixture has $nDays day(s) — recovery split degenerate")
  }

  test("session_window batch agrees with the gaps-and-islands formulation") {
    val gi = operators.Streaming.streamSession(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("sessions"), sum("n").as("events"))
    val sw = Tables.events(spark, sf0001)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("sessions"), sum("n").as("events"))
    val a = gi.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = sw.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("watermark drops events that arrive after their window closed") {
    implicit val ctx = spark.sqlContext
    def ev(id: Long, t: String) = Ev(id, Timestamp.valueOf(t), 1L, "view", 1.0)
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:10:00")); q.processAllAvailable()
      // advances the watermark to 11:50 — closes the [10:00,11:00) window
      ms.addData(ev(2, "2024-01-01 12:00:00")); q.processAllAvailable()
      // late arrival into the closed window — must be dropped
      ms.addData(ev(3, "2024-01-01 10:20:00")); q.processAllAvailable()
      // close the [12:00,13:00) window too
      ms.addData(ev(4, "2024-01-01 14:00:00")); q.processAllAvailable()
      val rows = spark.table("late")
        .select($"window.start".cast("string"), $"n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows("2024-01-01 10:00:00") === 1L, "late event must not be counted")
    } finally q.stop()
  }

  test("foreachBatch + dynamic partition overwrite = the full reference loop") {
    // the reference's dataflow end-to-end: files arrive incrementally →
    // each micro-batch idempotently replaces its day partitions → the
    // sink equals a one-shot batch load even when a batch is re-delivered
    val src = java.nio.file.Files.createTempDirectory("graft_fb_src_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ck_").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_fb_sink_").toString + "/out"
    val evs = fixtureEvents
    evs.grouped(400).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().coalesce(1).write.parquet(s"$src/drop_$i")
    }
    val schema = evs.toDF().schema
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def run(): Unit = {
        val q = spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(src)
          .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.write.mode("overwrite").partitionBy("day").parquet(sink)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination(120000) finally q.stop()
      }
      run()
      // "re-delivery": wipe the checkpoint so every file replays, then
      // re-run — dynamic partition overwrite must keep the sink identical
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
      run()
      val loaded = spark.read.parquet(sink)
      assert(loaded.count() === evs.size.toLong)
      assert(loaded.select("event_id").distinct().count() === evs.size.toLong,
        "partition re-load must not duplicate events")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("file-source incremental load == batch (the serverless trigger loop)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val evs = fixtureEvents
    // three "daily drops" arriving as separate files
    evs.grouped(400).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().coalesce(1).write.parquet(s"$dir/drop_$i")
    }
    val schema = evs.toDF().schema
    val q = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("val"))
      .writeStream.format("memory").queryName("inc")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("inc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = evs.toDF()
      .groupBy($"event_type").agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("val"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
  }

  test("checkpointed re-run is INCREMENTAL: only newly arrived files are processed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr2_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt2_").toString
    val evs = fixtureEvents
    val (first, late) = evs.splitAt(evs.size - 300)
    first.toDF().coalesce(1).write.parquet(s"$dir/drop_0")
    val schema = evs.toDF().schema

    def runOnce(name: String): Map[String, Long] = {
      val q = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(dir)
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val processed = q.recentProgress.map(p => p.numInputRows).sum
      assert(q.recentProgress.nonEmpty || processed == 0)
      rows
    }

    val r1 = runOnce("inc2_a")
    assert(r1.values.sum === first.size.toLong)
    // second drop arrives; the SAME checkpoint must replay only the delta
    late.toDF().coalesce(1).write.parquet(s"$dir/drop_1")
    val q2 = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("inc2_b")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination(120000) finally q2.stop()
    val newRows = q2.recentProgress.map(_.numInputRows).sum
    assert(newRows === late.size.toLong,
      s"checkpointed restart must read ONLY the new file's $newRows rows")
    val r2 = spark.table("inc2_b").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r2.values.sum === evs.size.toLong, "state restores + delta = full total")
  }
  test("seq_nfa: incremental mapGroupsWithState automaton == batch (state survives batch splits)") {
    implicit val ctx = spark.sqlContext
    import graft.operators.EventPattern
    // time-ordered chunks: per-user event order is preserved across
    // micro-batches, so the carried (state, count) must resume exactly
    val evs = fixtureEvents.sortBy(e => (e.ts.getTime, e.event_id))
      .map(e => graft.streaming.GEvent(e.event_id, e.ts, e.user_id, e.event_type, e.value))
    val ms = MemoryStream[graft.streaming.GEvent]
    val nfa = EventPattern.NfaSpec.stages(Seq("view", "click", "purchase"))
    val q = EventPattern.matchCountsIncremental(ms.toDS(), nfa)
      .toDF("user_id", "n_matches")
      .writeStream.format("memory").queryName("nfa_inc").outputMode("update").start()
    try {
      evs.grouped(317).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      // counts are monotone per user; update-mode emissions keep the max
      val streamed = spark.table("nfa_inc")
        .groupBy($"user_id").agg(max($"n_matches").as("n_matches"))
        .filter($"n_matches" > 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventPattern.seqNfa(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("seq_nfa_pred: incremental automaton over the REFINED alphabet == batch") {
    implicit val ctx = spark.sqlContext
    import graft.operators.EventPattern
    import graft.operators.EventPattern.QStage
    // the guard is symbol refinement, so the incremental form is the SAME
    // mapGroupsWithState runner fed events whose symbol was rewritten
    // upstream (in production: in the readStream projection). Threshold
    // from the engine's own percentile_disc — the value the batch query
    // broadcasts.
    val thr = Tables.events(spark, sf0001)
      .filter($"event_type" === "purchase")
      .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)"))
      .head().getDouble(0)
    val evs = fixtureEvents.sortBy(e => (e.ts.getTime, e.event_id))
      .map { e =>
        val sym = if (e.event_type == "purchase" && !(e.value > thr)) "purchase_lo"
                  else e.event_type
        graft.streaming.GEvent(e.event_id, e.ts, e.user_id, sym, e.value)
      }
    val ms = MemoryStream[graft.streaming.GEvent]
    val nfa = EventPattern.quantified(Seq(
      QStage("view", 1, QStage.Inf), QStage("click", 0, 1),
      QStage("purchase", 1, QStage.Inf)))
    val q = EventPattern.matchCountsIncremental(ms.toDS(), nfa)
      .toDF("user_id", "n_matches")
      .writeStream.format("memory").queryName("nfa_pred_inc").outputMode("update").start()
    try {
      evs.grouped(317).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val streamed = spark.table("nfa_pred_inc")
        .groupBy($"user_id").agg(max($"n_matches").as("n_matches"))
        .filter($"n_matches" > 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventPattern.seqNfaPred(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty, "fixture must exercise the guarded pattern")
    } finally q.stop()
  }

}
