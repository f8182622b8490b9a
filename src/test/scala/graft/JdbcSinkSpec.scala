package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.JdbcSink

/** The JDBC round-trip must be lossless: whatever the aggregate computes
  * is exactly what comes back out of the embedded Derby database —
  * values, types, and row count. A second run must overwrite cleanly
  * (the idempotent-reload property a warehouse loader needs). */
class JdbcSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def direct = Tables.orders(spark, sf0001)
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
    .orderBy(col("o_orderpriority").asc)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("jdbc_sink: write → read-back equals the direct aggregate") {
    val got = JdbcSink.jdbcSink(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.sameElements(direct))
  }

  test("jdbc_sink: overwrite reload is idempotent") {
    val first = JdbcSink.jdbcSink(spark, sf0001).collect().length
    val second = JdbcSink.jdbcSink(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(second.length == first)
    assert(second.sameElements(direct))
  }

  test("stale-dir sweep reaps dead dirs, keeps young and lock-held ones") {
    val root = java.nio.file.Files.createTempDirectory("graft_sweep_").toFile
    def mk(name: String, ageMs: Long, withLck: Boolean): java.io.File = {
      val d = new java.io.File(root, name); d.mkdirs()
      if (withLck) {
        val lck = new java.io.File(d, "dbex.lck")
        java.nio.file.Files.write(lck.toPath, Array[Byte](1))
        lck.setLastModified(System.currentTimeMillis() - ageMs)
      }
      d.setLastModified(System.currentTimeMillis() - ageMs)
      d
    }
    val dead = mk("derby_dead1", 7200000, withLck = true)   // old, unlocked
    val bare = mk("derby_dead2", 7200000, withLck = false)  // old, no lck
    val young = mk("derby_young", 1000, withLck = false)    // too recent
    val other = mk("not_derby", 7200000, withLck = false)   // wrong prefix
    // simulate a LIVE owner: hold an exclusive FileLock on dbex.lck
    val live = mk("derby_live", 7200000, withLck = true)
    val ch = java.nio.channels.FileChannel.open(
      new java.io.File(live, "dbex.lck").toPath,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock()
    try JdbcSink.sweepStale(root, System.currentTimeMillis() - 3600000)
    finally { lock.release(); ch.close() }
    assert(!dead.exists, "old unlocked dir must be reaped")
    assert(!bare.exists, "old lck-less dir must be reaped")
    assert(young.exists, "young dir must survive the age gate")
    assert(other.exists, "non-derby dirs are never touched")
    assert(live.exists, "a lock-held dir must survive even when old")
    JdbcSink.sweepStale(root, System.currentTimeMillis() + 10000)
    assert(!live.exists, "released lock -> reapable (proves the probe, not the age, protected it)")
    val _ = root.delete()
  }
}
