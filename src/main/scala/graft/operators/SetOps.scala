package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.G — set operations.
  *
  * Scale notes: `union` is a zero-shuffle concatenation of partition lists;
  * `intersect`/`except` compile to hash-partitioned semi/anti joins over
  * distinct keys (shuffle carries distinct keys only); the ALL variants add
  * per-key multiplicity counters. Outputs are aggregated/ordered so results
  * are order-free (§2.Z.1).
  */
object SetOps {

  private def fKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderstatus") === "F").select("o_custkey")
  private def oKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderstatus") === "O").select("o_custkey")

  /** UNION ALL of tagged branches, then aggregated (order-free). */
  def setUnionAll(spark: SparkSession, dir: String): DataFrame =
    fKeys(spark, dir).withColumn("tag", lit("F"))
      .unionAll(oKeys(spark, dir).withColumn("tag", lit("O")))
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), countDistinct("o_custkey").as("custs"))
      .orderBy(col("tag").asc)

  /** Distinct union of custkeys drawn from two different predicates. */
  def setUnionDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_totalprice") > 450000).select("o_custkey")
      .union(Tables.customer(spark, dir).filter(col("c_acctbal") > 9500)
        .select(col("c_custkey").as("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey").asc)

  /** Customers having BOTH an F- and an O-status order. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    fKeys(spark, dir).intersect(oKeys(spark, dir)).orderBy(col("o_custkey").asc)

  /** Customers with an F-status order but never an O-status one. */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    fKeys(spark, dir).except(oKeys(spark, dir)).orderBy(col("o_custkey").asc)

  /** INTERSECT ALL / EXCEPT ALL multiplicity semantics over priority
    * multisets, aggregated to per-value counts (stable). */
  def setAllVariants(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F").select("o_orderpriority")
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O").select("o_orderpriority")
    val ia = a.intersectAll(b).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val ea = a.exceptAll(b).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    ia.unionAll(ea)
      .select("op", "o_orderpriority", "n")
      .orderBy(col("op").asc, col("o_orderpriority").asc)
  }

  /** Schema-flexible union (`unionByName` + allowMissingColumns): two
    * feeds with overlapping-but-different columns merge by NAME, absent
    * columns null-filled — the multi-source ingest shape (positional
    * UNION would silently mis-align columns; a 100 TB pipeline fed by
    * evolving upstreams needs the by-name contract). Census over the
    * merged frame proves the null-fill landed on the right rows. */
  def setUnionByname(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    a.unionByName(b, allowMissingColumns = true)
      .agg(
        count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("with_prio"),
        count(col("o_custkey")).as("with_cust"),
        round(sum("o_totalprice"), 2).as("rev"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_byname" -> (setUnionByname _),
    "set_union_all"      -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect"      -> (setIntersect _),
    "set_except"         -> (setExcept _),
    "set_all_variants"   -> (setAllVariants _))

  val oracleSql: Map[String, String] = Map(
    "set_union_byname" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority, NULL AS o_custkey
        |  FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, NULL, o_custkey
        |  FROM orders WHERE o_orderstatus = 'F')
        |SELECT count(*) AS n, count(o_orderpriority) AS with_prio,
        |  count(o_custkey) AS with_cust, round(sum(o_totalprice), 2) AS rev
        |FROM u""".stripMargin,
    "set_union_all" ->
      """SELECT tag, count(*) AS n, count(DISTINCT o_custkey) AS custs FROM (
        |  SELECT o_custkey, 'F' AS tag FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey, 'O' AS tag FROM orders WHERE o_orderstatus = 'O') t
        |GROUP BY tag ORDER BY tag ASC""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9500
        |ORDER BY o_custkey ASC""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey ASC""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey ASC""".stripMargin,
    "set_all_variants" ->
      """WITH ia AS (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
        |ea AS (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'intersect_all' AS op, o_orderpriority, count(*) AS n FROM ia GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'except_all' AS op, o_orderpriority, count(*) AS n FROM ea GROUP BY o_orderpriority
        |ORDER BY op ASC, o_orderpriority ASC""".stripMargin)
}
