package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized fixture loaders (SURVEY.md §1.2, FIXTURES.md).
  *
  * Every `SparkEntry.queries` value re-reads from `sfDir` through these
  * helpers, so one session can be pointed at any scale factor. Tables are
  * plain parquet scans — Catalyst pushes filters/projections into the
  * vectorized reader, so there is deliberately NO caching here (each query
  * should read only the columns/row-groups it needs; see SURVEY §4.2).
  */
object Tables {

  /** All ten fixture tables (FIXTURES.md row-count table). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Path → schema, JVM-wide. The fixture files are immutable for the
    * process lifetime (same contract MemoFrames documents), so the schema
    * from the first read stays valid. The point is JOB COUNT, not CPU:
    * every schema-less `spark.read.parquet` schedules a footer-inference
    * job, one per table PER QUERY across the whole suite, and on a
    * contended driver each job start costs ~0.4 s of scheduling latency
    * (BASELINE.md r7 decomposition). With the cache, inference runs once
    * per (path) — in Bench, during the untimed warm-up — and every timed
    * query plans straight from the cached StructType. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.ts` is parquet `timestamp[ns]`, which Spark 4.1 can only read
    * as a raw Long under `spark.sql.legacy.parquet.nanosAsLong=true`
    * (FIXTURES.md "Loading recipes"). Convert ns→µs with integer division
    * (`div`) — exact for positive epochs and identical to DuckDB's native
    * ns→µs truncation, so oracle comparisons on `ts` agree to the µs.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet has ns timestamps: set spark.sql.legacy.parquet.nanosAsLong=true " +
        "on the SparkSession before reading it (see FIXTURES.md loading recipe)")
    read(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def byName(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" => events(spark, dir)
    case other    => read(spark, dir, other)
  }

  /** Register all tables as temp views for SQL-form queries (grouping sets,
    * offset pagination, …). Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => byName(spark, dir, n).createOrReplaceTempView(n))
}
