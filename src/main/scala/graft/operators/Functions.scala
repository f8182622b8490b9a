package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.H — scalar function families, one query per family.
  *
  * Everything here is a built-in `org.apache.spark.sql.functions` call, so
  * the whole projection stays inside WholeStageCodegen (no UDFs — SURVEY
  * §4.2) and is embarrassingly partition-parallel at any scale.
  * Cross-engine dialect traps (dayofweek, banker's rounding, NULL-skipping
  * least/greatest, double .xx5 boundaries) follow the validated
  * formulations in SURVEY §2.H/§2.Z.
  */
object Functions {

  /** String family over part: case, substring, pad, split, replace, regex
    * extract, LIKE/startswith. */
  def strFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub5"),
        length(col("p_name")).cast("bigint").as("len"),
        split(col("p_name"), " ").getItem(0).as("word1"),
        replace(col("p_name"), lit(" "), lit("_")).as("snake"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
        lpad(regexp_extract(col("p_brand"), "(\\d+)", 1), 3, "0").as("brand_pad"),
        concat_ws("|", split(col("p_name"), " ").getItem(0), col("p_type")).as("joined"),
        col("p_name").like("small%").as("is_small"),
        col("p_name").startsWith("red").as("is_red"))
      .orderBy(col("p_partkey").asc)

  /** Date/time family over orders. `dayofweek` is emitted as the day NAME
    * (`date_format(d,'E')` ↔ DuckDB `strftime(d,'%a')`) — the numeric
    * variants disagree across engines (SURVEY §2.H, validated). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "E").as("dow"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        expr("o_orderdate + INTERVAL 7 DAY").as("plus7"),
        datediff(col("o_orderdate"), date_trunc("month", col("o_orderdate")))
          .cast("bigint").as("day_in_month"),
        last_day(col("o_orderdate")).cast("timestamp").as("ld"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .cast("timestamp").as("md"),
        // unix_micros requires TIMESTAMP_LTZ; the parquet column is NTZ.
        // Session TZ is pinned UTC so the cast is instant-preserving.
        timestamp_micros(unix_micros(col("o_orderdate").cast("timestamp_ltz"))).as("ts_rt"))
      .orderBy(col("o_orderkey").asc)

  /** Math family over customer (c_acctbal spans negatives). ceil/floor are
    * cast to BIGINT on both engines (Spark returns LONG, DuckDB DOUBLE). */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        round(col("c_acctbal"), 1).as("r1"),
        abs(col("c_acctbal")).as("ab"),
        ceil(col("c_acctbal")).cast("bigint").as("ce"),
        floor(col("c_acctbal")).cast("bigint").as("fl"),
        round(sqrt(abs(col("c_acctbal"))), 6).as("sq"),
        round(pow(col("c_acctbal"), 2), 4).as("p2"),
        round(log(abs(col("c_acctbal")) + 1), 6).as("ln1"),
        round(log10(abs(col("c_acctbal")) + 1), 6).as("l10"),
        (col("c_custkey") % 7).as("m7"),
        signum(col("c_acctbal")).cast("int").as("sg"),
        greatest(col("c_acctbal"), lit(0.0)).as("gz"),
        least(col("c_acctbal"), lit(0.0)).as("lz"))
      .orderBy(col("c_custkey").asc)

  /** Conditional family: CASE WHEN ladder, coalesce, nullif, if,
    * NULL-skipping greatest/least. */
  def condFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("none")).as("status_or_none"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("is_f"),
        // greatest/least skip NULL operands on both engines
        greatest(nullif(col("o_totalprice"), col("o_totalprice")), lit(100.0)).as("g_null"),
        least(nullif(col("o_orderstatus"), col("o_orderstatus")), lit("zzz")).as("l_null"))
      .orderBy(col("o_orderkey").asc)

  /** Decimal money semantics: CAST(double AS DECIMAL) arithmetic sums are
    * EXACT — no rounding needed for cross-engine equality (SURVEY §2.H
    * cast_decimal, validated: sum = 3183256271.63 exactly). Values are
    * emitted as full-scale strings: a final scale-reducing decimal CAST
    * would diverge (DuckDB's decimal downcast TRUNCATES, Spark's rounds
    * HALF_UP — measured: .1154 → .11 vs .12). */
  def castDecimal(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("string").as("gross"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,4)"))
          .cast("string").as("net"))
      .orderBy(col("l_returnflag").asc)

  /** Array family + higher-order functions over documents.text. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("bigint").as("ntoks"),
        size(array_distinct(toks)).cast("bigint").as("vocab"),
        array_contains(toks, "spark").as("has_spark"),
        // joined to a string — raw array cells are unhashable in the
        // driver's pandas comparator (round-1 failure)
        concat_ws(",", slice(sort_array(array_distinct(toks)), 1, 3)).as("first3"),
        size(filter(toks, t => length(t) > 4)).cast("bigint").as("longtoks"),
        aggregate(transform(toks, t => length(t).cast("bigint")),
          lit(0L), (acc, x) => acc + x).as("total_chars"))
      .orderBy(col("doc_id").asc)
  }

  /** Regex family (beyond str_funcs' single extract): replace-all,
    * rlike, match counting, anchored extraction — POSIX-simple patterns
    * only, where both engines' dialects agree (SURVEY §2.Z). */
  def strRegex(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("gear|bolt|widget").as("is_hw"),
        regexp_count(col("p_name"), lit("[aeiou]")).cast("bigint").as("vowels"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("noun"))
      .orderBy(col("p_partkey").asc)

  /** Nested JSON round-trip: per-event nested document (struct + array)
    * built with to_json, parsed back with a full nested schema, array
    * exploded, aggregated — proves structured JSON survives the
    * serialize→parse→shred path losslessly (the oracle computes the same
    * numbers from the raw columns, no JSON involved). */
  def jsonNested(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        to_json(struct(col("event_type").as("t"),
          array(col("value"), col("value") * 2).as("vals"))).as("js"))
      .select(expr("from_json(js, 't STRING, vals ARRAY<DOUBLE>')").as("p"))
      .select(col("p.t").as("t"), explode(col("p.vals")).as("v"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("val"))
      .orderBy(col("t").asc)

  /** Map family: per-user event_type→count map built with
    * map_from_entries, then exploded back to rows (maps are never compared
    * directly — §2.Z.8). */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    counts
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")),
        size(map_keys(col("m"))).cast("bigint").as("ntypes"))
      .orderBy(col("user_id").asc, col("event_type").asc)
  }

  /** JSON family over events.props: get_json_object path extract, schema'd
    * from_json, to_json round-trip. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        expr("from_json(props, 'k INT').k").cast("bigint").as("k_int"),
        to_json(struct(expr("from_json(props, 'k INT').k").as("k"))).as("rt"))
      .orderBy(col("event_id").asc)

  /** Ordered per-group string aggregation (LISTAGG/string_agg):
    * collect_set + sort_array + concat_ws ↔ DuckDB
    * `string_agg(DISTINCT ... ORDER BY ...)` — sorted ⇒ deterministic. */
  def aggStringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc)

  /** Error-safe expression family: try_cast on dirty strings, NULL-safe
    * division via nullif — the ANSI-error-free paths a batch pipeline
    * needs (one bad row must not kill a 100 TB job). */
  def condTry(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .withColumn("dirty",
        when(col("p_size") % 3 === 0, concat(lit("x"), col("p_size"))) // unparseable
          .otherwise(col("p_size").cast("string")))
      .select(
        col("p_partkey"),
        col("dirty"),
        expr("try_cast(dirty AS INT)").as("parsed"),
        round(col("p_retailprice") / nullif((col("p_size") - 5).cast("double"), lit(0.0)), 6)
          .as("safe_div"))
      .orderBy(col("p_partkey").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_string_agg" -> (aggStringAgg _),
    "cond_try"       -> (condTry _),
    "str_funcs"    -> (strFuncs _),
    "date_funcs"   -> (dateFuncs _),
    "math_funcs"   -> (mathFuncs _),
    "cond_funcs"   -> (condFuncs _),
    "cast_decimal" -> (castDecimal _),
    "array_funcs"  -> (arrayFuncs _),
    "map_funcs"    -> (mapFuncs _),
    "json_funcs"   -> (jsonFuncs _),
    "str_regex"    -> (strRegex _),
    "json_nested"  -> (jsonNested _))

  val oracleSql: Map[String, String] = Map(
    "str_regex" ->
      """SELECT p_partkey,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | regexp_matches(p_name, 'gear|bolt|widget') AS is_hw,
        | CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS vowels,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS noun
        |FROM part ORDER BY p_partkey ASC""".stripMargin,
    "json_nested" ->
      """SELECT event_type AS t, CAST(count(*) * 2 AS BIGINT) AS n,
        | round(sum(value * 3), 2) AS val
        |FROM events GROUP BY t ORDER BY t ASC""".stripMargin,
    "agg_string_agg" ->
      """SELECT o_orderpriority,
        | string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus ASC) AS statuses,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin,
    "cond_try" ->
      """SELECT p_partkey,
        | CASE WHEN p_size % 3 = 0 THEN concat('x', p_size) ELSE CAST(p_size AS VARCHAR) END AS dirty,
        | TRY_CAST(CASE WHEN p_size % 3 = 0 THEN concat('x', p_size)
        |               ELSE CAST(p_size AS VARCHAR) END AS INT) AS parsed,
        | round(p_retailprice / nullif(CAST(p_size - 5 AS DOUBLE), 0.0), 6) AS safe_div
        |FROM part ORDER BY p_partkey ASC""".stripMargin,
    "str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_type) AS lo,
        | substr(p_name, 1, 5) AS sub5, CAST(length(p_name) AS BIGINT) AS len,
        | split_part(p_name, ' ', 1) AS word1,
        | replace(p_name, ' ', '_') AS snake,
        | regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        | lpad(regexp_extract(p_brand, '(\d+)', 1), 3, '0') AS brand_pad,
        | concat_ws('|', split_part(p_name, ' ', 1), p_type) AS joined,
        | p_name LIKE 'small%' AS is_small,
        | starts_with(p_name, 'red') AS is_red
        |FROM part ORDER BY p_partkey ASC""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | quarter(o_orderdate) AS qtr, strftime(o_orderdate, '%a') AS dow,
        | date_trunc('month', o_orderdate) AS mstart,
        | o_orderdate + INTERVAL 7 DAY AS plus7,
        | date_diff('day', date_trunc('month', o_orderdate), o_orderdate) AS day_in_month,
        | CAST(last_day(o_orderdate) AS TIMESTAMP) AS ld,
        | CAST(make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS TIMESTAMP) AS md,
        | make_timestamp(epoch_us(o_orderdate)) AS ts_rt
        |FROM orders ORDER BY o_orderkey ASC""".stripMargin,
    "math_funcs" ->
      """SELECT c_custkey, round(c_acctbal, 1) AS r1, abs(c_acctbal) AS ab,
        | CAST(ceil(c_acctbal) AS BIGINT) AS ce, CAST(floor(c_acctbal) AS BIGINT) AS fl,
        | round(sqrt(abs(c_acctbal)), 6) AS sq, round(pow(c_acctbal, 2), 4) AS p2,
        | round(ln(abs(c_acctbal) + 1), 6) AS ln1, round(log10(abs(c_acctbal) + 1), 6) AS l10,
        | c_custkey % 7 AS m7, CAST(sign(c_acctbal) AS INT) AS sg,
        | greatest(c_acctbal, 0.0) AS gz, least(c_acctbal, 0.0) AS lz
        |FROM customer ORDER BY c_custkey ASC""".stripMargin,
    "cond_funcs" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 300000 THEN 'high'
        |      WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS tier,
        | coalesce(nullif(o_orderstatus, 'O'), 'none') AS status_or_none,
        | CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f,
        | greatest(nullif(o_totalprice, o_totalprice), 100.0) AS g_null,
        | least(nullif(o_orderstatus, o_orderstatus), 'zzz') AS l_null
        |FROM orders ORDER BY o_orderkey ASC""".stripMargin,
    "cast_decimal" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS gross,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS net
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""".stripMargin,
    "array_funcs" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS ntoks,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS vocab,
        | list_contains(string_split(text, ' '), 'spark') AS has_spark,
        | array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3,
        | CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS BIGINT) AS longtoks,
        | CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS total_chars
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY user_id, event_type),
        |t AS (SELECT user_id, count(*) AS ntypes FROM c GROUP BY user_id)
        |SELECT c.user_id, c.event_type, c.cnt, t.ntypes
        |FROM c JOIN t ON c.user_id = t.user_id
        |ORDER BY c.user_id ASC, c.event_type ASC""".stripMargin,
    "json_funcs" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
        | to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INT))) AS rt
        |FROM events ORDER BY event_id ASC""".stripMargin)
}
