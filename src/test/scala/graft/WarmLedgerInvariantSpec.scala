package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MemoFrames, SharedArtifacts}

/** Warm-artifact ledger invariant (round 14, VERDICT r13 task 5): the
  * bench's untimed warm-up builds every session-shared memo artifact and
  * carries its cost in the artifact ledger (`warm_artifacts` in the bench
  * JSON). That design is honest only while the ledger is COMPLETE — a new
  * operator that memoizes a shared frame without registering it in
  * SharedArtifacts would pay its build inside whichever timed query runs
  * first, exactly the attribution bug the ledger exists to prevent.
  *
  * This spec makes completeness self-enforcing: warm the declared
  * artifacts, snapshot the session's shared memo keys, then CONSTRUCT
  * every declared query (construction is where the operator defs invoke
  * MemoFrames.frame/stagedPath — eager parquet builds, stream stagings,
  * trainer loops all run in the def body) and assert no NEW shared key
  * appeared. Per-call `materialize` tags are per-invocation by contract
  * and intentionally out of scope (they are timed work).
  *
  * Scope note: the shared TestSpark session may already hold keys built
  * by earlier suites — those are inside the post-warm snapshot either
  * way, so the assertion only weakens if ANOTHER suite consumed the
  * missing artifact first in the same JVM; the driver's fresh bench JVM
  * has no such shadow. */
class WarmLedgerInvariantSpec extends AnyFunSuite {
  import TestSpark._

  test("every shared memo key a declared query builds is in the warm ledger") {
    val warmed = SharedArtifacts.warm(spark, sf0001)
    assert(warmed.nonEmpty)
    val failed = warmed.filter(_._2 < 0).map(_._1)
    assert(failed.isEmpty, s"artifacts failed to warm: ${failed.mkString(", ")}")
    val ledgerKeys = MemoFrames.knownKeys(spark)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, sf0001); () }
      catch { case e: Throwable =>
        fail(s"query $name failed to construct at sf0.001: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    val unwarmed = MemoFrames.knownKeys(spark) -- ledgerKeys
    assert(unwarmed.isEmpty,
      s"shared memo keys built OUTSIDE the warm ledger: " +
        s"${unwarmed.toSeq.sorted.mkString(", ")} — register them in " +
        "SharedArtifacts so the bench warm-up carries their cost visibly")
  }
}
