package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams" — standard
  * public algorithm) as the engine's second `TypedImperativeAggregate`:
  * top-k terms over arbitrarily large streams with a FIXED m-counter
  * buffer instead of a full (term → count) aggregation.
  *
  * Guarantees: any item with true count > N/m is retained; counts are
  * upper bounds within N/m. With fewer than m distinct items the counts
  * are EXACT — which makes the declared query over the ~30-word fixture
  * vocabulary fully oracle-able while the sketch regime (distinct > m) is
  * unit-tested on a synthetic skewed stream.
  *
  * Merge = sum shared counters, keep singles, trim to the m largest
  * (count desc, term asc — total order, so partials merge
  * deterministically for a given input SET). 100 TB story: every executor
  * ships an m-entry buffer, never its term dictionary.
  */
case class TopKSketch(
    child: Expression,
    m: Int = 64,
    k: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  type Buf = java.util.HashMap[String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new java.util.HashMap[String, java.lang.Long]()

  /** The eviction victim: smallest count, ties broken toward the LARGER
    * term so the kept set is deterministic. */
  private def minEntry(buf: Buf): (String, Long) = {
    var mk: String = null
    var mc = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      if (c < mc || (c == mc && (mk == null || e.getKey.compareTo(mk) > 0))) {
        mk = e.getKey; mc = c
      }
    }
    (mk, mc)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != null) buf.put(s, cur + 1L)
      else if (buf.size < m) buf.put(s, 1L)
      else {
        val (mk, mc) = minEntry(buf) // SpaceSaving: inherit the evicted count
        buf.remove(mk)
        buf.put(s, mc + 1L)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    while (b1.size > m) { val (mk, _) = minEntry(b1); b1.remove(mk) }
    b1
  }

  override def eval(buf: Buf): Any = {
    val top = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); top(i) = (e.getKey, e.getValue.longValue()); i += 1 }
    val picked = top.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(picked.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((b, e.getValue.longValue()))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size())
    entries.forEach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_sketch"

  /** String child only (round-13 review): `update` casts the evaluated
    * value straight to UTF8String — a long column would CLASS-CAST at
    * runtime mid-job rather than fail at analysis. Same post-resolution
    * seam as CountMinFreq. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
}
