package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-probe bridge: re-exports `private[operators]` internals the round-17
  * probes time in isolation. Main-source because the probes are mains, not
  * tests; adds no declared surface — and `private[graft]` (ADVICE r17) so
  * the memo internals stay unexported outside this artifact's own
  * packages instead of being public by convention only. */
private[graft] object ProbeAccess {
  def graphPairs(spark: SparkSession, dir: String): DataFrame =
    Clustering.graphPairs(spark, dir)
}
