package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 optimization pins. The OUTPUT equivalence of this round's
  * jaccard rewrite (partial-agg removal behind an explicit (s1,s2)
  * exchange) is already pinned bit-exactly by Round17OptSpec's r16-replay
  * references, which ran green against the round-18 forms; this spec pins
  * the round's NEW structural contracts:
  *
  *  - the graph arc table's bucket count is SIZE-DERIVED with the session's
  *    configured shuffle partitions as the floor (VERDICT r17 task 3) — at
  *    fixture scale the derivation must floor to exactly the session value,
  *    so a deployment's parallelism is never undercut by the on-disk layout;
  *  - scaleParts' conf-unreadable SENTINEL (≤ 0) makes both
  *    withShufflePartitions forms leave the session conf untouched
  *    (ADVICE r17: never install a fabricated count);
  *  - withShufflePartitionsScoped runs its body WITHOUT holding the
  *    MemoFrames monitor (ADVICE r17: a streaming await must not block
  *    micro-batch/concurrent memo callers — the deadlock hazard).
  */
class Round18OptSpec extends AnyFunSuite {
  import TestSpark._

  test("graph arc table buckets floor at the session's shuffle partitions") {
    // building any consumer of the shared arc artifact stages the bucketed
    // table; the test session runs at 4 shuffle partitions over a tiny
    // fixture, so the byte-derivation must FLOOR to 4 (pre-r18: always 32)
    SparkEntry.queries("graph_pagerank")(spark, sf0001).collect()
    val tbl = spark.sessionState.catalog.listTables("default")
      .map(_.table).filter(_.startsWith("graft_arcs_b_"))
    assert(tbl.nonEmpty, "bucketed arc table not found in the catalog")
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val specs = tbl.map(t => spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec)
    assert(specs.forall(_.isDefined), "arc table lost its bucket spec")
    // every arc table staged by this suite's sessions shares the 4-part
    // test conf; a tiny fixture can never out-derive the floor
    assert(specs.flatten.map(_.numBuckets).distinct == Seq(sessionParts),
      s"expected bucket count == session parallelism ($sessionParts), " +
        s"got ${specs.flatten.map(_.numBuckets).distinct}")
  }

  test("scaleParts sentinel (≤ 0) leaves the session conf untouched") {
    val k = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(k)
    operators.MemoFrames.withShufflePartitions(spark, -1) {
      assert(spark.conf.get(k) == before, "plain form overrode conf on sentinel")
    }
    operators.MemoFrames.withShufflePartitionsScoped(spark, 0) {
      assert(spark.conf.get(k) == before, "scoped form overrode conf on sentinel")
    }
    assert(spark.conf.get(k) == before)
  }

  test("withShufflePartitionsScoped does not hold the MemoFrames monitor across its body") {
    val k = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(k)
    val entered = new java.util.concurrent.CountDownLatch(1)
    operators.MemoFrames.withShufflePartitionsScoped(spark, 7) {
      assert(spark.conf.get(k) == "7")
      // a concurrent MemoFrames-synchronized call must complete while the
      // scoped body runs — with the monitor held (the pre-r18 plain form's
      // behavior) this would dead-wait and the latch would never count down
      val t = new Thread(() => {
        operators.MemoFrames.knownKeys(spark) // synchronized on MemoFrames
        entered.countDown()
      })
      t.start()
      assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "a concurrent memo caller blocked on the monitor during the scoped body")
      t.join(10000)
    }
    assert(spark.conf.get(k) == before, "scoped form failed to restore conf")
  }
}
