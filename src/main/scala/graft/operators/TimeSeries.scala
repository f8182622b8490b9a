package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series resampling (SURVEY §1.1's time-series row): a complete
  * date spine generated with `sequence`, sparse daily aggregates joined
  * onto it, and gaps forward-filled with `last(..., ignoreNulls)` — the
  * resample/gap-fill/LOCF pattern every billing or metrics pipeline needs.
  *
  * Scale notes: the spine is O(days) regardless of fact volume; the
  * sparse aggregate is a partial+final hash agg; the forward fill is one
  * sort over O(days) rows. For multi-entity fills, partition the window
  * by the entity key — same shape, even spread.
  */
object TimeSeries {

  def tsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    // spine bounds from the full table (deterministic)
    val bounds = orders.agg(
      date_trunc("day", min(col("o_orderdate"))).as("mn"),
      date_trunc("day", max(col("o_orderdate"))).as("mx"))
    val spine = bounds.select(
      explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    // a sparse series: only high-value urgent orders
    val sparse = orders
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(sparse, Seq("day"), "left")
      .withColumn("rev_filled", coalesce(last(col("rev"), ignoreNulls = true).over(w), lit(0.0)))
      .select("day", "rev", "rev_filled")
      .orderBy(col("day").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_gapfill" -> (tsGapfill _))

  val oracleSql: Map[String, String] = Map(
    "ts_gapfill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('day', min(o_orderdate)) AS mn,
        |         date_trunc('day', max(o_orderdate)) AS mx FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
        |sparse AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice), 2) AS rev
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
        |  GROUP BY day)
        |SELECT spine.day, sparse.rev,
        |  coalesce(last_value(sparse.rev IGNORE NULLS) OVER (
        |    ORDER BY spine.day ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS rev_filled
        |FROM spine LEFT JOIN sparse ON spine.day = sparse.day
        |ORDER BY spine.day ASC""".stripMargin)
}
