package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .repartition(32, col("user_id"))
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
