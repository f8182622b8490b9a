package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSourceV2 batch connector (SURVEY §2.A's "custom source"
  * axis): deterministic synthetic documents generated partition-parallel,
  * with REAL filter pushdown (doc_id range predicates narrow the generated
  * range — pruned rows are never produced) and REAL column pruning (only
  * requested columns are materialized into each InternalRow).
  *
  * The generation rule is pure arithmetic on doc_id, so a DuckDB oracle
  * reproduces it exactly from `generate_series` — the connector is held to
  * the same hash-match bar as every other operator.
  *
  * Usage:
  * `spark.read.format("graft.sources.SyntheticDocs")
  *   .option("rows", n).option("partitions", p).load()`
  *
  * Scale story: this is the shape of any generator/manifest-driven source
  * at 100 TB — planInputPartitions splits the key space evenly, each
  * executor materializes only its slice, and pushdown means a
  * doc_id-ranged query plans work proportional to the RANGE, not the
  * table. `description()` exposes the pushed range + pruned schema, which
  * the spec asserts.
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

object SyntheticDocs {
  val LANGS: Array[String] = Array("de", "en", "es", "fr", "zh")
  val SCHEMA: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  def lang(id: Long): String = LANGS((id % 5).toInt)
  def source(id: Long): String = "src" + (id % 20)
  def nChars(id: Long): Long = 50 + (id * 37) % 500
}

private class DocsTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocsScanBuilder(rows, parts)
}

private class DocsScanBuilder(rows: Long, parts: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticDocs.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1); true
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull("doc_id")                   => true // non-null by construction
      case _                                     => false
    }
    pushed = accepted
    rejected // Spark re-applies anything we couldn't take
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new DocsScan(lo, hi, parts, required)
}

private class DocsScan(lo: Long, hi: Long, parts: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SyntheticDocs range=[$lo, $hi) cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val per = math.max(1L, (n + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => (lo + i * per, math.min(hi, lo + (i + 1) * per)))
      .filter { case (s, e) => s < e }
      .map { case (s, e) => DocsRange(s, e): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocsReaderFactory(required.fieldNames)
}

private case class DocsRange(start: Long, end: Long) extends InputPartition

private class DocsReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[DocsRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        // column pruning for real: only requested fields are materialized
        val values: Array[Any] = cols.map {
          case "doc_id"  => id
          case "lang"    => UTF8String.fromString(SyntheticDocs.lang(id))
          case "source"  => UTF8String.fromString(SyntheticDocs.source(id))
          case "n_chars" => SyntheticDocs.nChars(id)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
