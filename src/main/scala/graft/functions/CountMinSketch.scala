package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch as a `TypedImperativeAggregate` — the
  * third mergeable sketch next to KMV (distinct count) and SpaceSaving
  * (top-k): point-frequency estimates over a stream in fixed memory
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications" — standard public sketch).
  *
  * Buffer: d×w long counters (d hash rows via seed-varied xxhash64).
  * `update` adds 1 to one counter per row; `merge` is element-wise
  * addition — partials combine across partitions/stages/jobs, so a
  * 100 TB frequency table ships d·w·8 bytes per group, never keys.
  * `eval` answers the fixed probe list with min-over-rows — the classic
  * estimate, which NEVER undercounts and overcounts by at most εN
  * (ε = e/w) with probability 1−δ (δ = e^−d). Deterministic for a given
  * input multiset (hash-based, order-free); no-oracle as a declared
  * query (hash layouts are engine-specific), guarantees unit-tested in
  * CountMinSpec.
  */
case class CountMinFreq(
    child: Expression,
    probes: Seq[String],
    depth: Int = 4,
    width: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  private def slot(row: Int, h: Long): Int =
    row * width + java.lang.Math.floorMod(h, width.toLong).toInt

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var i = 0
      while (i < depth) {
        buf(slot(i, XxHash64Function.hash(v, child.dataType, 42L + i))) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val ests = probes.map { p =>
      val v = UTF8String.fromString(p)
      var est = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = buf(slot(i, XxHash64Function.hash(v, child.dataType, 42L + i)))
        if (c < est) est = c
        i += 1
      }
      est
    }
    new GenericArrayData(ests.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "countmin_freq"

  /** String child only (round-13 review): `eval` hashes the probe list as
    * UTF8String with the CHILD's dataType, so a non-string child would
    * silently probe the wrong slots (update hashes longs, eval hashes
    * strings — estimates become noise, never an error). Post-resolution
    * type check is the Catalyst seam for rejecting that at analysis time
    * (a constructor require would fire on unresolved children). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinFreq =
    copy(child = newChildren.head)
}
