package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.C — join operators (the equi-join core; theta/as-of/interval
  * joins live in JoinsAdvanced).
  *
  * Scale notes (SURVEY §4.2/§4.4): dimension sides are `broadcast()`-hinted
  * so the 100 TB fact side never shuffles for star enrichment; large-large
  * joins (orders⋈lineitem) deliberately leave Catalyst free to pick
  * sort-merge with both sides hash-partitioned on the key — the only
  * shuffle shape that scales; AQE (on by default) converts to broadcast /
  * splits skewed partitions at runtime. Semi/anti joins ship only the key
  * column to the build side. Determinism: §2.Z total ORDER BY everywhere.
  */
object Joins {

  /** Star-dim enrichment: fact⋈dim⋈dim with explicit broadcast hints —
    * the 100 TB-safe star join (no fact shuffle). */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("customers"), round(sum("c_acctbal"), 2).as("bal"))
      .orderBy(col("r_name").asc, col("n_name").asc)

  /** Large-large equi join (TPC-H q3 shape): shuffle/sort-merge on the fact
    * keys, partial agg before the final top-k. */
  def joinShuffle(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(100)

  /** TPC-H q5 shape: 6-table join with the two-key local-supplier condition
    * `c_nationkey = s_nationkey`. */
  def joinMultikey(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey") &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)

  /** LEFT JOIN preserving unmatched customers: per-customer count of 'P'
    * orders, 0 where none (referential integrity is total — FIXTURES.md —
    * so the filter manufactures the unmatched side). */
  def joinLeft(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("p_orders"))
      .orderBy(col("c_custkey").asc)

  /** FULL OUTER join of two filtered per-nation aggregates — NULL-key
    * discipline on both unmatched sides. */
  def joinRightFull(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir).filter(col("s_acctbal") > 5000)
      .groupBy("s_nationkey").agg(count(lit(1)).as("suppliers"))
    val cust = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
      .groupBy("c_nationkey").agg(count(lit(1)).as("customers"))
    sup.join(cust, col("s_nationkey") === col("c_nationkey"), "full")
      .select(
        coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        coalesce(col("suppliers"), lit(0L)).as("suppliers"),
        coalesce(col("customers"), lit(0L)).as("customers"))
      .orderBy(col("nationkey").asc)
  }

  /** LEFT SEMI: customers having at least one order above the threshold —
    * only the key column crosses the join. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey").asc)

  /** LEFT ANTI: customers with no 'P'-status order (56 rows at sf0.01 —
    * FIXTURES.md; unfiltered anti would be empty). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey").asc)

  /** Cartesian product of the two tiny dims with a derived pair score. */
  def joinCross(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir)
      .crossJoin(Tables.nation(spark, dir))
      .select(
        col("r_name"), col("n_name"),
        (col("r_regionkey") * 100 + col("n_nationkey")).as("pair_score"))
      .orderBy(col("r_name").asc, col("n_name").asc)

  /** NULL-safe equality join (`<=>` / SQL `IS NOT DISTINCT FROM`): the
    * join key is nullable ('F' orders carry an unknown priority), and the
    * null-safe operator makes NULL match NULL — a plain equi-join would
    * silently DROP every NULL-keyed row (three-valued logic), the classic
    * late-arriving-dimension bug. Catalyst still plans this as a hash
    * join (null-safe equality is hashable: NULL gets its own hash class),
    * so the scale story is unchanged from join_broadcast. */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val k = when(col("o_orderstatus") === "F", lit(null))
      .otherwise(col("o_orderpriority"))
    val fact = Tables.orders(spark, dir).withColumn("k", k)
    val dim = fact.select(col("k").as("d_k")).distinct()
      .withColumn("grp", coalesce(col("d_k"), lit("UNKNOWN")))
    fact.join(broadcast(dim), col("k") <=> col("d_k"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
      .orderBy(col("grp").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_null_safe"  -> (joinNullSafe _),
    "join_broadcast"  -> (joinBroadcast _),
    "join_shuffle"    -> (joinShuffle _),
    "join_multikey"   -> (joinMultikey _),
    "join_left"       -> (joinLeft _),
    "join_right_full" -> (joinRightFull _),
    "join_semi"       -> (joinSemi _),
    "join_anti"       -> (joinAnti _),
    "join_cross"      -> (joinCross _))

  val oracleSql: Map[String, String] = Map(
    "join_null_safe" ->
      """WITH f AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN NULL
        |              ELSE o_orderpriority END AS k, o_totalprice
        |  FROM orders),
        |d AS (SELECT DISTINCT k AS d_k,
        |        coalesce(k, 'UNKNOWN') AS grp FROM f)
        |SELECT grp, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.d_k
        |GROUP BY grp ORDER BY grp ASC""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS customers, round(sum(c_acctbal),2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name ASC, n_name ASC""".stripMargin,
    "join_shuffle" ->
      """SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |JOIN lineitem ON o_orderkey = l_orderkey AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 100""".stripMargin,
    "join_multikey" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS p_orders
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') p ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey ASC""".stripMargin,
    "join_right_full" ->
      """WITH sup AS (SELECT s_nationkey, count(*) AS suppliers FROM supplier
        |             WHERE s_acctbal > 5000 GROUP BY s_nationkey),
        |     cust AS (SELECT c_nationkey, count(*) AS customers FROM customer
        |              WHERE c_acctbal > 9000 GROUP BY c_nationkey)
        |SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
        |       coalesce(suppliers, 0) AS suppliers, coalesce(customers, 0) AS customers
        |FROM sup FULL OUTER JOIN cust ON s_nationkey = c_nationkey
        |ORDER BY nationkey ASC""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey ASC""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey ASC""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name, r_regionkey * 100 + n_nationkey AS pair_score
        |FROM region CROSS JOIN nation
        |ORDER BY r_name ASC, n_name ASC""".stripMargin)
}
