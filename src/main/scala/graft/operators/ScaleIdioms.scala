package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed rows for the order-preserving per-partition passes below. Field
  * names must match the upstream column names (Dataset.as matches by
  * name). */
case class DocPartRow(doc_id: Long, lang: String, pid: Int)
case class UserEventRow(user_id: Long, tsus: Long, event_id: Long, event_type: String)

/** Distributed-execution idioms that every big batch pipeline eventually
  * needs, declared as first-class operators:
  *
  *  - `ids_global`: contiguous global ids in key order WITHOUT a global
  *    single-partition sort (range-partition + local sort + per-partition
  *    offset join — the scalable `row_number() OVER (ORDER BY …)`).
  *  - `sec_sort_path`: the secondary-sort pattern — per-key
  *    time-ordered streaming iteration with O(current group) memory,
  *    for sequential per-key logic (CDC replay, session reconstruction)
  *    that a window frame can't express.
  *
  * Both use `mapPartitions` for genuinely imperative per-partition logic
  * (the documented last-resort case), with every wide step declarative.
  */
object ScaleIdioms {

  /** Assign stable contiguous global ids 0..n−1 in `doc_id` order.
    *
    * The naive `row_number() OVER (ORDER BY doc_id)` forces the whole
    * corpus through ONE task. The scale shape, all but one step
    * declarative: range-repartition + sort within partitions (global
    * order across partition boundaries, fully parallel), per-partition
    * counts → exclusive prefix sum on an O(#partitions) frame (the only
    * single-partition window, bounded by cluster width not data), local
    * index via an order-preserving typed pass (a window PARTITION BY pid
    * would re-shuffle the corpus), broadcast the offsets back.
    *
    * Determinism: range boundaries are sampled with fixed per-partition
    * seeds over a stable parquet scan, and ids depend only on the global
    * doc_id order, not where the boundaries fall — re-evaluation yields
    * identical ids. The offsets branch is derived from the SAME localIdx
    * value (counts = max local index + 1), so the two branches
    * canonicalize identically and exchange reuse ships the corpus range
    * shuffle once (a `parted.groupBy(pid).count()` sibling would prune
    * different scan columns and defeat the reuse). */
  def idsGlobal(spark: SparkSession, dir: String): DataFrame =
    idsGlobalFrom(spark, Tables.documents(spark, dir).select(col("doc_id"), col("lang")))

  /** DataFrame-input variant: lets callers (and the partitioning-
    * invariance test) feed the corpus through ANY initial layout — the
    * ids depend only on the global doc_id order because the first step
    * below re-range-partitions unconditionally. */
  def idsGlobalFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val parted = docs
      .select(col("doc_id"), col("lang"))
      .repartitionByRange(32, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())

    val localIdx = parted.as[DocPartRow]
      .mapPartitions { it =>
        var i = -1L
        it.map { r => i += 1; (r.doc_id, r.lang, r.pid, i) }
      }
      .toDF("doc_id", "lang", "pid", "lix")

    // O(#partitions) frame: per-partition counts → exclusive prefix sum.
    val offW = Window.orderBy(col("pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = localIdx.groupBy("pid").agg((max("lix") + 1).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(offW), lit(0L)))
      .select("pid", "off")

    localIdx
      .join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("lang"), (col("off") + col("lix")).as("gid"))
      .orderBy(col("doc_id").asc)
  }

  /** Per-user time-ordered event path via the secondary-sort idiom:
    * repartition by user (hash, even spread), sort within partitions by
    * (user, ts, event_id), then ONE streaming pass whose memory is the
    * current group only — never the partition. This is the shape for
    * per-key sequential algorithms where window frames don't fit (string
    * building here; CDC apply, custom sessionizers in general). Scales
    * with users per partition; the sort is Spark's spillable external
    * sorter, so even a pathological user doesn't OOM the pass. */
  def secSortPath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sorted = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsus"),
        col("event_id"), col("event_type"))
      // width-less: session shuffle partitions, not a literal 32 — the
      // same 1000-executor argument as EventPattern.matchUsersOf
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tsus"), col("event_id"))

    sorted.as[UserEventRow]
      .mapPartitions { rows =>
        val in = rows.buffered
        new Iterator[(Long, Long, String)] {
          def hasNext: Boolean = in.hasNext
          def next(): (Long, Long, String) = {
            val u = in.head.user_id
            val sb = new StringBuilder
            var n = 0L
            while (in.hasNext && in.head.user_id == u) {
              val r = in.next()
              if (n > 0) sb.append('>')
              sb.append(r.event_type)
              n += 1
            }
            (u, n, sb.toString)
          }
        }
      }
      .toDF("user_id", "n", "path")
      .orderBy(col("user_id").asc)
  }

  /** Global `rn` (row_number, 1-based) — and, when `cumOf` is set, a
    * global running `cum` of that column — over a TOTAL order, WITHOUT a
    * single-task global sort: the declarative two-level prefix-sum idiom
    * (agg_mannwhitney's rank trick, generalized in round 10 for the
    * customer-grain rank consumers agg_pareto / rfm_segments /
    * cust_migration, after hist_eqdepth's instance of the same
    * scale-killer was fixed).
    *
    * Contract: `bin` must be a coarse bucketing ALIGNED with the leading
    * order column — bin boundaries never split equal order keys, and bin
    * order (`binAsc`) equals row order — so global rank = preceding-bin
    * count + within-bin rank. Within-bin windows are partitioned
    * (parallel, frames bounded by bin width); the only unpartitioned
    * window is the bin-offset cumsum over the DOMAIN-bounded bin frame.
    * `order` must totally order rows within a bin (tie-break included),
    * exactly as the single-window form it replaces. `cumOf` must be an
    * exact-integer column (LongType) so prefix sums are
    * grouping-independent.
    *
    * `offsJoinHint`: "broadcast" (default) for plans executed under AQE;
    * "merge" when the caller runs the whole plan inside an AQE-off
    * materialize write, where a planned broadcast builds its relation in
    * a DEDICATED scheduled job and the in-job shuffle of the bin-grain
    * offset frame is free (the basket_rules/hist_eqdepth measurement). */
  private[graft] def twoLevelRank(df: DataFrame, bin: Column, binAsc: Boolean,
      order: Seq[Column], cumOf: Option[Column] = None,
      offsJoinHint: String = "broadcast"): DataFrame = {
    // the helper appends rn/cum and threads __-prefixed internals; a
    // caller column with one of these names would be silently replaced
    val reserved = Seq("rn", "cum", "__bin", "__rnb", "__offn", "__offs", "__n", "__s")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty, s"twoLevelRank input must not contain ${clash.mkString(", ")}")
    val d = df.withColumn("__bin", bin)
    val wBin = Window.partitionBy("__bin").orderBy(order: _*)
    val binOrd = if (binAsc) col("__bin").asc else col("__bin").desc
    val wOff = Window.orderBy(binOrd).rowsBetween(Window.unboundedPreceding, -1)
    val binAgg = cumOf match {
      case Some(c) => d.groupBy("__bin").agg(count(lit(1)).as("__n"), sum(c).as("__s"))
      case None    => d.groupBy("__bin").agg(count(lit(1)).as("__n"))
    }
    val offs = {
      val o = binAgg.withColumn("__offn", coalesce(sum("__n").over(wOff), lit(0L)))
      val withCum = cumOf match {
        case Some(_) => o.withColumn("__offs", coalesce(sum("__s").over(wOff), lit(0L)))
        case None    => o
      }
      withCum.drop("__n", "__s")
    }
    val hinted = if (offsJoinHint == "broadcast") broadcast(offs)
                 else offs.hint(offsJoinHint)
    val joined = d
      .withColumn("__rnb", row_number().over(wBin).cast("long"))
      .join(hinted, "__bin")
      .withColumn("rn", col("__offn") + col("__rnb"))
    val out = cumOf match {
      case Some(c) => joined.withColumn("cum",
        col("__offs") + sum(c).over(
          wBin.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case None => joined
    }
    out.drop("__bin", "__rnb", "__offn", "__offs")
  }

  /** `ntile(k)` reproduced from a GLOBAL 1-based rank `rn` and the total
    * row count `n` — SQL ntile semantics exactly (first n mod k buckets
    * get ⌈n/k⌉ rows, the rest ⌊n/k⌋): lets the two-level rank above
    * replace an unpartitioned `ntile(k) OVER (ORDER BY …)` without a
    * single-task sort. All arithmetic is exact for n < 2^52 (double
    * division of exact integers, truncating cast = floor for
    * non-negatives). NtileFormulaSpec pins equality against Spark's
    * ntile for every n in 1..64. */
  private[graft] def ntileFromRank(k: Int, rn: Column, n: Column): Column = {
    val q = (n / k).cast("long")           // ⌊n/k⌋
    val m = n - q * k                      // n mod k: the big-bucket count
    when(q === 0, rn)                      // n < k: row r is bucket r
      .when(rn <= m * (q + 1), ((rn - 1) / (q + 1)).cast("long") + 1)
      .otherwise(m + ((rn - 1 - m * (q + 1)) / q).cast("long") + 1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ids_global"    -> (idsGlobal _),
    "sec_sort_path" -> (secSortPath _))

  val oracleSql: Map[String, String] = Map(
    "ids_global" ->
      """SELECT doc_id, lang,
        |  row_number() OVER (ORDER BY doc_id ASC) - 1 AS gid
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "sec_sort_path" ->
      """SELECT user_id, count(*) AS n,
        |  string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
        |FROM events GROUP BY user_id ORDER BY user_id ASC""".stripMargin)
}
