package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The STREAMING form of stream_topk's bounded per-key ranking: a typed
  * Aggregator whose buffer is the ≤k best (value, id) entries seen so far
  * — exactly the state a micro-batch engine keeps per (window, type)
  * group under complete/update output. reduce and merge both re-trim to
  * k, so the buffer is bounded regardless of how many events or partial
  * states flow in, and merge is associative+commutative — the property
  * that makes incremental execution ≡ the batch TopKPerKey heap exec
  * (pinned in StreamingEquivalenceSpec against the declared query).
  *
  * Ordering matches the batch operator: higher value wins; on equal
  * value the LOWER id wins. k is fixed at construction; the k·O(k log k)
  * per-event cost is irrelevant at k=3 and the state stays k rows at
  * 100 TB/day stream volume — this is why windowed top-k is streamable
  * at all, where a full ranking would need unbounded state. */
class StreamTopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)
  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    trim(b :+ a)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
