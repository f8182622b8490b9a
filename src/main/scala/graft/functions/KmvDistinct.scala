package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the custom-UDAF seam for mergeable
  * sketches (SURVEY §4.3's taxonomy).
  *
  * The buffer keeps the k smallest xxhash64 values of the inputs (unsigned
  * order). With fewer than k distinct values the sketch is EXACT (it holds
  * every distinct hash); beyond that the classic KMV estimator
  * `(k-1) · 2^64 / kth-smallest` applies (Bar-Yossef et al., "Counting
  * distinct elements in a data stream" — standard public sketch; same
  * family DuckDB/Spark HLLs belong to). Deterministic for a given input
  * SET (hash-based, order-free), and `merge` is a set union of two
  * buffers — partials merge across partitions, stages, or entirely
  * separate jobs, which is what makes sketches the 100 TB answer to
  * distinct counting (ship 2 KB buffers, not keys).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Hashes are stored sign-flipped so TreeSet's signed order equals
    * unsigned hash order. */
  private def flip(h: Long): Long = h ^ Long.MinValue

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    val f = flip(h)
    if (buf.size < k) buf.add(f)
    else if (f < buf.last) { buf.add(f); if (buf.size > k) buf.remove(buf.last) }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val f = it.next().longValue()
      if (b1.size < k) b1.add(f)
      else if (f < b1.last) { b1.add(f); if (b1.size > k) b1.remove(b1.last) }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // kth smallest hash as a fraction of the unsigned 2^64 space
      val h = buf.last.longValue() ^ Long.MinValue // un-flip to the raw hash
      val u = if (h >= 0) h.toDouble else h.toDouble + 1.8446744073709552e19
      math.round((k - 1) / (u / 1.8446744073709552e19))
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v.longValue()))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}
