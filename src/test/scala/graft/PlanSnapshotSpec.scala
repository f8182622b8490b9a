package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Plan-regression guard: every declared query's physical plan is reduced
  * to a small fingerprint — shuffle-exchange count, broadcast-exchange
  * count, parquet-scan count, and how many of those scans carry pushed
  * filters — and frozen against a committed snapshot
  * (src/test/resources/plan_snapshot.json). A future edit that silently
  * adds a shuffle, drops a broadcast, or loses scan pushdown fails here
  * long before it shows up as a bench regression.
  *
  * AQE is disabled on the snapshot session so the fingerprint is the
  * STATIC plan Catalyst produces (AQE only re-plans at runtime, and its
  * plan is input-size-dependent — not a stable snapshot target).
  *
  * Regenerate after an INTENTIONAL plan change with:
  *   PLAN_SNAPSHOT_REGEN=1 sbt "testOnly graft.PlanSnapshotSpec"
  * and commit the diff — the review of that diff IS the plan review.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val session = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def fingerprint(df: DataFrame): Seq[Int] = {
    val plan = df.queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }.size
    val broadcasts = plan.collect { case e: BroadcastExchangeExec => e }.size
    val scans = plan.collect { case s: FileSourceScanExec => s }
    val pushed = scans.count(_.metadata.get("PushedFilters").exists(_ != "[]"))
    Seq(shuffles, broadcasts, scans.size, pushed)
  }

  private def render(rows: Seq[(String, Seq[Int])]): String =
    rows.map { case (n, f) => s""""$n": [${f.mkString(",")}]""" }
      .mkString("{\n", ",\n", "\n}\n")

  test("all declared queries match the committed plan snapshot") {
    val snapPath = java.nio.file.Paths.get("src/test/resources/plan_snapshot.json")
    val actual = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fingerprint(fn(session, sf0001))
    }
    val rendered = render(actual)
    if (sys.env.contains("PLAN_SNAPSHOT_REGEN") ||
        !java.nio.file.Files.exists(snapPath)) {
      java.nio.file.Files.createDirectories(snapPath.getParent)
      java.nio.file.Files.writeString(snapPath, rendered)
      info(s"snapshot (re)generated at $snapPath — commit it")
    } else {
      val expected = java.nio.file.Files.readString(snapPath)
      if (rendered != expected) {
        val exp = expected.linesIterator.toSet
        val act = rendered.linesIterator.toSet
        val diff = ((act -- exp).map("+ " + _) ++ (exp -- act).map("- " + _))
          .toSeq.sorted.mkString("\n")
        fail(s"plan fingerprints drifted from snapshot " +
          s"([shuffles, broadcasts, scans, pushed-filter scans]):\n$diff\n" +
          "If intentional, regenerate with PLAN_SNAPSHOT_REGEN=1 and commit.")
      }
    }
  }
}
