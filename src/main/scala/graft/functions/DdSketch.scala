package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType}

/** DDSketch quantile state as a `TypedImperativeAggregate` — the fourth
  * custom sketch aggregate next to KMV / Count-Min / SpaceSaving, and the
  * QUANTILE twin of the theta/KMV union seam (SURVEY §2.D round-13
  * addendum, VERDICT r12 task 4 / "what's missing" #1).
  *
  * Algorithm: the relative-error exponential-bucket quantile sketch of
  * Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
  * sketch with relative-error guarantees" (VLDB 2019 — public paper).
  * A positive value x lands in bucket ⌈ln(x)/ln(γ)⌉ with
  * γ = (1+α)/(1−α); the bucket's representative 2·γ^i/(γ+1) (the
  * geometric midpoint of (γ^{i−1}, γ^i]) is within relative error α of
  * every value in the bucket, so ANY rank's estimate is within α of the
  * true order statistic. Non-positive values (none in the declared
  * inputs, but the aggregate must not silently corrupt) go to the
  * reserved bucket Int.MinValue with representative 0.0.
  *
  * Why DDSketch over the t-digest/KLL the verdict floated: the state is a
  * bucket→count map of LONGS, so `merge` is integer vector addition —
  * exactly commutative/associative, which makes the state BIT-equal under
  * any partitioning or merge order (t-digest centroids drift with merge
  * order; KLL compaction is randomized). That is the same determinism
  * contract ThetaUnionSpec pins for KMV, and it makes the cross-source
  * union expressible as pure column algebra
  * (`aggregate(collect_list(state), map(), map_zip_with-add)`) with the
  * algebraic union's state provably identical to a direct corpus-wide
  * sketch — QuantileUnionSpec pins all of it.
  *
  * Buffer growth is logarithmic in the value RANGE, not the data: at
  * α = 1% a bucket spans 2% of value space, so [1, 10⁶] needs ~690
  * buckets (~8 KB serialized) and the absolute worst case over all
  * positive doubles is ~71k buckets — but `eval` additionally
  * CANONICALIZES to `maxBuckets` by collapsing the lowest-index buckets
  * into the lowest kept one (the paper's collapse rule, applied at
  * eval rather than per-update so it is a pure function of the final
  * merged multiset — per-update collapse would break merge-order
  * invariance). Low-rank quantiles of a collapsed state lose the α
  * guarantee only below bucket `maxBuckets` from the top, documented
  * exactly like the paper's bounded variant.
  */
case class DdSketchState(
    child: Expression,
    alpha: Double = 0.01,
    maxBuckets: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[Integer, java.lang.Long]] {

  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
  // ≥ 2: the collapse must be able to hold the reserved bucket plus at
  // least one positive-geometry bucket
  require(maxBuckets >= 2, s"maxBuckets must be >= 2, got $maxBuckets")

  private val gamma = (1 + alpha) / (1 - alpha)
  private val invLogGamma = 1.0 / math.log(gamma)

  override def createAggregationBuffer(): java.util.TreeMap[Integer, java.lang.Long] =
    new java.util.TreeMap[Integer, java.lang.Long]()

  /** Positive-geometry bucket index, floored at Int.MinValue+1: at a
    * legal tiny alpha (invLogGamma huge) a subnormal x yields an index
    * below Int range, and double→int SATURATES to Int.MinValue — which
    * would collide with the reserved non-positive bucket and classify a
    * positive value as "zero/negative" (round-13 review). The clamp only
    * merges values already below γ^(MinValue+1) — indistinguishable from
    * 0 at any representable γ — so the α guarantee is unaffected. */
  private def bucketOf(x: Double): Int =
    if (x > 0) {
      val b = math.ceil(math.log(x) * invLogGamma)
      if (b <= (Int.MinValue + 1).toDouble) Int.MinValue + 1 else b.toInt
    } else Int.MinValue

  private def bump(buf: java.util.TreeMap[Integer, java.lang.Long], i: Int, n: Long): Unit = {
    val prev = buf.get(i)
    buf.put(i, if (prev == null) n else prev + n); ()
  }

  override def update(
      buf: java.util.TreeMap[Integer, java.lang.Long],
      input: InternalRow): java.util.TreeMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case s: java.lang.Short => s.doubleValue()
        case b: java.lang.Byte => b.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => other.toString.toDouble
      }
      if (!x.isNaN) bump(buf, bucketOf(x), 1L)
    }
    buf
  }

  override def merge(
      b1: java.util.TreeMap[Integer, java.lang.Long],
      b2: java.util.TreeMap[Integer, java.lang.Long]): java.util.TreeMap[Integer, java.lang.Long] = {
    b2.forEach((i, n) => bump(b1, i.intValue(), n.longValue()))
    b1
  }

  /** Canonical state: entries ascending by bucket index, collapsed to at
    * most `maxBuckets` by folding the lowest POSITIVE-GEOMETRY indices
    * into the lowest kept bucket. The reserved Int.MinValue bucket
    * (non-positive inputs) is NEVER folded — its representative is 0.0,
    * and merging its count into a positive bucket would silently turn
    * zeros/negatives into positive estimates (round-13 review); when
    * present it occupies one of the maxBuckets slots. Pure function of
    * the merged buffer ⇒ partition invariant. */
  override def eval(buf: java.util.TreeMap[Integer, java.lang.Long]): Any = {
    val reserved = buf.get(Int.box(Int.MinValue))
    // positive-geometry entries only (ascending; TreeMap order), the
    // reserved bucket handled separately so the fold can never touch it
    val pos = new java.util.ArrayList[(Int, Long)](buf.size())
    buf.forEach((i, n) =>
      if (i.intValue() != Int.MinValue) { pos.add((i.intValue(), n.longValue())); () })
    val keep = if (reserved != null) maxBuckets - 1 else maxBuckets
    val over = pos.size() - keep
    val head = if (reserved != null) 1 else 0
    val outN = head + math.min(pos.size(), keep)
    val ks = new Array[Int](outN); val cs = new Array[Long](outN)
    if (reserved != null) { ks(0) = Int.MinValue; cs(0) = reserved.longValue() }
    if (over <= 0) {
      var j = 0
      while (j < pos.size()) {
        ks(head + j) = pos.get(j)._1; cs(head + j) = pos.get(j)._2; j += 1
      }
    } else {
      // collapse pos[0, over] into the single bucket pos(over)
      var folded = 0L
      var j = 0
      while (j <= over) { folded += pos.get(j)._2; j += 1 }
      ks(head) = pos.get(over)._1; cs(head) = folded
      j = 1
      while (over + j < pos.size()) {
        ks(head + j) = pos.get(over + j)._1; cs(head + j) = pos.get(over + j)._2
        j += 1
      }
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(cs))
  }

  override def serialize(buf: java.util.TreeMap[Integer, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 12)
    bb.putInt(buf.size())
    buf.forEach((i, n) => { bb.putInt(i.intValue()); bb.putLong(n.longValue()); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Integer, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getInt, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType =
    MapType(IntegerType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "ddsketch_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketchState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketchState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdSketchState =
    copy(child = newChildren.head)
}
