package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Loader-visible schema contract for every fixture table (FIXTURES.md).
  *
  * Why this exists: the driver regenerates `/root/testdata` between rounds
  * and has already changed physical parquet encodings once (2026-08-13:
  * events.ts ns→µs, order/ship dates ms→µs) — which surfaced as dozens of
  * identical cryptic analysis failures deep inside operator specs. This
  * spec fails FIRST and names the exact table/column/type that moved, so
  * the next regeneration is a one-minute diagnosis. It asserts what the
  * ENGINE depends on (post-loader Spark types), not raw parquet encodings:
  * timestamp columns may arrive LTZ or NTZ from any given generation —
  * both are accepted wherever queries tolerate both — while `events.ts`
  * must be exactly TimestampType because `Tables.events` promises that
  * normalization to every window/watermark consumer.
  */
class FixtureContractSpec extends AnyFunSuite {
  import TestSpark._

  private def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** column -> acceptable Spark types (post-Tables loader). */
  private val contract: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map(
      "r_regionkey" -> (_ == IntegerType), "r_name" -> (_ == StringType)),
    "nation" -> Map(
      "n_nationkey" -> (_ == IntegerType), "n_name" -> (_ == StringType),
      "n_regionkey" -> (_ == IntegerType)),
    "customer" -> Map(
      "c_custkey" -> (_ == LongType), "c_name" -> (_ == StringType),
      "c_nationkey" -> (_ == IntegerType), "c_acctbal" -> (_ == DoubleType),
      "c_mktsegment" -> (_ == StringType)),
    "supplier" -> Map(
      "s_suppkey" -> (_ == LongType), "s_name" -> (_ == StringType),
      "s_nationkey" -> (_ == IntegerType), "s_acctbal" -> (_ == DoubleType)),
    "part" -> Map(
      "p_partkey" -> (_ == LongType), "p_name" -> (_ == StringType),
      "p_brand" -> (_ == StringType), "p_type" -> (_ == StringType),
      "p_size" -> (_ == IntegerType), "p_retailprice" -> (_ == DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> (_ == LongType), "o_custkey" -> (_ == LongType),
      "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
      "o_orderdate" -> isTimestamp _, "o_orderpriority" -> (_ == StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> (_ == LongType), "l_partkey" -> (_ == LongType),
      "l_suppkey" -> (_ == LongType), "l_linenumber" -> (_ == IntegerType),
      "l_quantity" -> (_ == DoubleType), "l_extendedprice" -> (_ == DoubleType),
      "l_discount" -> (_ == DoubleType), "l_tax" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> isTimestamp _),
    "events" -> Map(
      "event_id" -> (_ == LongType),
      // exact: Tables.events PROMISES TimestampType regardless of the
      // fixture generation's physical encoding (ns-as-long or naive µs)
      "ts" -> (_ == TimestampType),
      "user_id" -> (_ == LongType), "event_type" -> (_ == StringType),
      "value" -> (_ == DoubleType), "props" -> (_ == StringType)),
    "documents" -> Map(
      "doc_id" -> (_ == LongType), "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> (_ == LongType)),
    "embeddings" -> Map(
      "vec_id" -> (_ == LongType),
      "embedding" -> (dt => dt == ArrayType(FloatType, containsNull = true) ||
                            dt == ArrayType(FloatType, containsNull = false)),
      "label" -> (_ == IntegerType)))

  for (sf <- Seq(sf0001, sf001)) {
    test(s"all fixture tables at $sf load with the contracted Spark types") {
      val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
        val loaded =
          try Right(Tables.byName(spark, sf, table))
          catch { case e: Exception => Left(e) }
        loaded match {
          case Left(e) =>
            Seq(s"$table: loader threw ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ")} " +
              "— the fixtures were likely regenerated with a new physical " +
              "encoding; compare pq.read_schema against FIXTURES.md")
          case Right(df) =>
            val actual = df.schema.map(f => f.name -> f.dataType).toMap
            cols.toSeq.sortBy(_._1).flatMap { case (col, ok) =>
              actual.get(col) match {
                case None =>
                  Some(s"$table.$col: MISSING (present: ${actual.keys.toSeq.sorted.mkString(", ")})")
                case Some(dt) if !ok(dt) =>
                  Some(s"$table.$col: unexpected type $dt — fixture " +
                    "regeneration changed an encoding the engine depends on " +
                    "(see FIXTURES.md type table and the Tables loader)")
                case _ => None
              }
            }
        }
      }
      assert(problems.isEmpty, "\n" + problems.mkString("\n"))
    }
  }
}
