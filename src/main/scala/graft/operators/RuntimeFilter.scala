package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Explicit runtime-filter (semi-join reduction) join — the 100 TB star
  * join where the fact side is pruned BEFORE its shuffle by a Bloom
  * filter built from the filtered dimension's keys (Bloom-join; the
  * pattern Catalyst's InjectRuntimeFilter applies automatically when a
  * shuffle join's creation-side is selective enough, made explicit and
  * deterministic here as a declared operator).
  *
  * Shape: dim (customers in one mktsegment) is filtered and its key set
  * folded into a spark-sketch Bloom filter (bit-OR merge ⇒ order- and
  * partitioning-independent, fixed-seed hashes ⇒ deterministic). The
  * fact (orders) probes the filter with a codegen'd expression inside
  * its scan stage — only the ~1/5 of fact rows that might join ever
  * reach the join's exchange. The exact join afterwards removes Bloom
  * false positives, so the RESULT is bit-identical to the plain join
  * and the DuckDB oracle is the plain formulation.
  *
  * At 100 TB: the build side is a driver-scale object only because the
  * dim filter is selective (the same contract as every broadcast here);
  * the win is that the probe side's shuffle shrinks by the filter's
  * selectivity — for a fact-heavy join that is the dominant cost.
  */
object RuntimeFilter {

  def joinBloomPruned(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // capacity is a fixed constant (not a count() of the input) so the
    // filter's bit layout is deterministic at every scale factor; 2^17
    // keys at 1% fpp is ~157 KB — broadcast-scale
    // stat.bloomFilter over an EMPTY build side NPEs inside Spark itself
    // (BloomFilter.readFrom(null) — the aggregate returns null bytes when
    // no row ever updated it; round-13 tiny-corpus sweep). The catch is
    // scoped to exactly that empty-build signature — an NPE raised FROM
    // BloomFilter.readFrom's deserialization of the null aggregate bytes
    // (stack verified: ByteArrayInputStream.<init> ← BloomFilter.readFrom
    // ← DataFrameStatFunctions) — and costs nothing on the happy path; an
    // isEmpty pre-check would bill one extra scheduled job per
    // invocation. Any OTHER NullPointerException (a Spark regression, an
    // executor fault surfacing driver-side) propagates instead of being
    // masked as "empty dimension" (ADVICE r13). An empty dim admits no
    // joins, so the scan-stage filter becomes constant-false and the
    // exact join produces the same (empty) result the oracle computes.
    // Stack-frame guard caveat: HotSpot elides stack traces on
    // repeatedly-thrown hot exceptions (-XX:+OmitStackTraceInFastThrow,
    // on by default), so an empty-trace NPE from this call site is ALSO
    // accepted — that only occurs after the same empty-build NPE has
    // already been thrown (and matched) thousands of times in this JVM,
    // so the empty trace is the fast-throw form of the same signature,
    // not a fresh unrelated fault (round-14 review).
    val bfOpt =
      try Some(cust.stat.bloomFilter("c_custkey", 1 << 17, 0.01))
      catch {
        case e: NullPointerException
            if e.getStackTrace.isEmpty ||
              e.getStackTrace.take(4).exists(f =>
                f.getClassName == "org.apache.spark.util.sketch.BloomFilter" &&
                  f.getMethodName == "readFrom") =>
          // Signature matched — but OmitStackTraceInFastThrow elides traces
          // per THROW SITE, so an unrelated hot NPE could also arrive
          // empty-traced (ADVICE r14). Before classifying as "empty
          // dimension" (which turns the probe into a constant-false scan —
          // a SILENT empty result if wrong), confirm the build side really
          // is empty. One limit(1) job, and only on this already-
          // exceptional path — the happy path still pays nothing.
          if (cust.limit(1).count() == 0) None else throw e
      }
    val pruned = Tables.orders(spark, dir)
      .filter(bfOpt match {
        case Some(bf) =>
          graft.functions.bloom.mightContainLong(col("o_custkey").cast("long"), bf)
        case None => lit(false)
      })
    pruned
      .join(cust, col("o_custkey") === col("c_custkey")) // exact: drops Bloom false positives
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("orders"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderpriority").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bloom_pruned" -> (joinBloomPruned _))

  val oracleSql: Map[String, String] = Map(
    "join_bloom_pruned" ->
      """SELECT o_orderpriority, count(*) AS orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin)
}
