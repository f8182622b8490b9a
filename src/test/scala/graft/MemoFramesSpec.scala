package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MemoFrames

/** The memo/materialize infrastructure every shared core now rides on:
  * build-once semantics, result fidelity, schema-cached read-backs, and
  * the session-scoped file lifecycle. */
class MemoFramesSpec extends AnyFunSuite {
  import TestSpark._

  test("frame: build runs exactly once per (session, key); reads are fresh scans") {
    val s = spark.newSession()
    var builds = 0
    def get() = MemoFrames.frame(s, "memospec_once") {
      builds += 1
      s.range(100).select(col("id"), (col("id") * 2).as("v"))
    }
    val a = get().collect().map(_.getLong(1)).sum
    val b = get().collect().map(_.getLong(1)).sum
    assert(builds === 1)
    assert(a === 9900L && b === a)
  }

  test("frame: distinct keys and distinct sessions memoize independently") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val r1 = MemoFrames.frame(s1, "memospec_k") { s1.range(5).toDF() }.count()
    val r2 = MemoFrames.frame(s1, "memospec_k2") { s1.range(7).toDF() }.count()
    // same key, different session: must rebuild (5 rows again, not shared)
    val r3 = MemoFrames.frame(s2, "memospec_k") { s2.range(9).toDF() }.count()
    assert((r1, r2, r3) === ((5L, 7L, 9L)))
  }

  test("materialize: returns the same rows and is NOT memoized") {
    val s = spark.newSession()
    var builds = 0
    def mat() = MemoFrames.materialize(s, "memospec_mat", {
      builds += 1
      s.range(50).select(col("id"), (col("id") % 3).as("m"))
    })
    val a = mat().groupBy("m").count().orderBy("m").collect().map(_.getLong(1)).toSeq
    val b = mat().groupBy("m").count().orderBy("m").collect().map(_.getLong(1)).toSeq
    assert(builds === 2) // every call writes — it is a lineage cut, not a cache
    assert(a === Seq(17L, 17L, 16L) && b === a)
  }

  test("materialize: read-back schema matches the input frame's columns") {
    val s = spark.newSession()
    val df = s.range(10).select(col("id"), lit("x").as("tag"),
      array(col("id"), col("id") + 1).as("arr"))
    val back = MemoFrames.materialize(s, "memospec_schema", df)
    assert(back.columns.toSeq === Seq("id", "tag", "arr"))
    assert(back.select(element_at(col("arr"), 2)).collect().map(_.getLong(0)).sum === 55L)
  }

  test("memo files live under the JVM base dir and belong to the session") {
    val s = spark.newSession()
    MemoFrames.frame(s, "memospec_files") { s.range(3).toDF() }.count()
    // THIS JVM's real memo base (never hand-rebuilt — ScratchPathHygieneSpec)
    val jvmDir = MemoFrames.jvmBaseDir
    assert(jvmDir.isDirectory, s"memo base $jvmDir missing")
    // this JVM's dir contains at least one session dir with our memo file
    val memoFiles = jvmDir.listFiles().filter(_.getName.startsWith("session_"))
      .flatMap(_.listFiles()).filter(_.getName.contains("memospec_files"))
    assert(memoFiles.nonEmpty, "memoized parquet not found under the session dir")
  }
}
