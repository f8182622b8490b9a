package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared candidate-pair generator for the blocked dedup family
  * (`llm_dedup_near`, `llm_ngram_jaccard`, and through them the
  * `llm_dedup_clusters` / `llm_dedup_apply` edge stages): all unordered
  * pairs within equal-block-key groups, with the quadratic pair
  * enumeration SALTED so no single join key ever owns a whole block.
  *
  * Why: the blocks are (lang, length-band) — a ~50-value key space. A
  * plain self-join on the block key puts the hottest block's k²/2 pair
  * candidates on ONE task regardless of cluster width (AQE's skew-join
  * split can divide a partition, but never one key's matches), which is
  * the classic 100 TB skew bomb the round-3 verdict flagged.
  *
  * Scheme (triangle / 1-bucket-theta partitioning, Okcan & Riedewald):
  * each row gets a salt s = hash(id) mod S. The S·(S+1)/2 unordered salt
  * pairs {i ≤ j} become join buckets. A row salted s enters bucket (i, j)
  * on the LEFT when i = s (so j ranges s..S−1: S−s copies) and on the
  * RIGHT when j = s (so i ranges 0..s: s+1 copies). A doc pair with salts
  * (sa, sb), sa ≤ sb, then meets in EXACTLY bucket (sa, sb) — the left
  * side pins i to the smaller salt, the right pins j to the larger —
  * except both orientations appear on the diagonal bucket (s, s), where
  * the id inequality dedups as usual.
  *
  * Cost: S+1 payload copies through the shuffle (linear, spread over all
  * map tasks) buys a per-key candidate bound of (2k/S)² for a block of k
  * — S=8 turns one k²-sized task into ≤36 tasks of ~k²/16 each. Total
  * candidate work is unchanged (Σ per-bucket products telescopes back to
  * k²/2 per block); only its placement changes, so results — and the
  * DuckDB oracles, which keep the plain blocked self-join formulation —
  * are identical pair-for-pair (SkewCanarySpec asserts both properties).
  */
object BlockedPairs {

  val DefaultShards = 8

  /** The replicated join sides, exposed for SkewCanarySpec's work-balance
    * audit. `d` must carry an `id` column; block keys are prefixed l_/r_,
    * everything else rides in the `r`/`s` payload structs. */
  private[graft] def saltedSides(d: DataFrame, blockKeys: Seq[String],
      shards: Int): (DataFrame, DataFrame) = {
    val payload = struct(d.columns.toIndexedSeq.filterNot(blockKeys.contains).map(col): _*)
    val keyed = d.select(
      blockKeys.map(col) ++ Seq(
        pmod(xxhash64(col("id")), lit(shards.toLong)).cast("int").as("salt"),
        payload.as("r")): _*)
    val lhs = keyed.select(
      blockKeys.map(c => col(c).as(s"l_$c")) ++ Seq(
        col("salt").as("bi"),
        explode(sequence(col("salt"), lit(shards - 1))).as("bj"),
        col("r")): _*)
    val rhs = keyed.select(
      blockKeys.map(c => col(c).as(s"r_$c")) ++ Seq(
        explode(sequence(lit(0), col("salt"))).as("ci"),
        col("salt").as("cj"),
        col("r").as("s")): _*)
    (lhs, rhs)
  }

  /** All unordered within-block pairs of `d`, as structs `a` and `b` of
    * the non-block-key columns with a.id < b.id guaranteed. */
  def saltedSelfPairs(d: DataFrame, blockKeys: Seq[String],
      shards: Int = DefaultShards): DataFrame = {
    require(shards >= 1, "shards must be positive")
    val (lhs, rhs) = saltedSides(d, blockKeys, shards)
    val keyCond = blockKeys.map(c => col(s"l_$c") === col(s"r_$c")).reduce(_ && _)
    val cond = keyCond && col("bi") === col("ci") && col("bj") === col("cj") &&
      (col("bi") =!= col("bj") || col("r.id") < col("s.id"))
    lhs.join(rhs, cond)
      .select(
        when(col("r.id") < col("s.id"), col("r")).otherwise(col("s")).as("a"),
        when(col("r.id") < col("s.id"), col("s")).otherwise(col("r")).as("b"))
  }
}
