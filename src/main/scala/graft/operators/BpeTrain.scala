package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.J/K addendum (round 11, VERDICT r10 "what's missing" #3)
  * — the BPE merge LOOP: `llm_bpe_pairs` ranks ONE round's candidate
  * merges; this operator runs the iterative tokenizer-training recursion
  * (Sennrich's byte-pair encoding): seed every word as a space-separated
  * character sequence, then N times (a) count adjacent symbol pairs
  * weighted by word frequency, (b) merge the most frequent pair
  * everywhere it occurs. The output is the learned merge table — the
  * artifact a tokenizer ships.
  *
  * Distribution shape (the real BPE trainer's): the CORPUS is touched
  * exactly once, collapsing into the word-frequency dict — vocabulary-
  * bounded at any corpus size (the explode→hash-agg shape every llm_*
  * text op uses). All N training rounds then operate on that dict: each
  * round is ONE scheduled job (a TakeOrdered argmax over the lazily
  * merge-chained dict, AQE-off), and the only driver-side state is the
  * 1-row winning pair per round — codebook-class, the llm_ann_ivf
  * allowance. The merge application is a regexp_replace chained ON the
  * materialized dict file, so round k re-evaluates k cheap
  * vocab-bounded projections instead of re-scanning the corpus; at 10×
  * the vocabulary this is still dict-sized work.
  *
  * Merge semantics: left-to-right non-overlapping replacement (Java
  * replaceAll's scan — exactly BPE's greedy application; "a a a" under
  * merge (a,a) → "aa a"). Symbol boundaries are guarded by 1-char
  * lookarounds (?<![^ ]) / (?![^ ]), so "ab c" never matches inside
  * "dab c". Ties break (count desc, pair asc) — fully deterministic,
  * partition-layout-independent (pinned in BpeTrainSpec).
  *
  * NO-ORACLE: the data-dependent loop has no recursive-SQL form in the
  * oracle dialect (the llm_pca/llm_minhash allowance); BpeTrainSpec pins
  * the invariants instead — determinism under repartition, boundary
  * safety, and the exact symbol-count ledger (each round shrinks the
  * weighted symbol total by its winning pair's count when the pair's
  * halves differ; overlapping self-pairs shrink by ≥ half of it). */
object BpeTrain {

  /** Run `rounds` BPE merges over a (word, freq) dict. Returns the merge
    * table (round, left, right, freq) — driver-side rows are 1 per
    * round. */
  private[graft] def bpeMerges(spark: SparkSession, dict: DataFrame,
      rounds: Int): Seq[(Long, String, String, Long)] = MemoFrames.noAqe(spark) {
    // seed: word → space-separated characters (filter drops the empty
    // fragments Java's zero-width split emits at the edges)
    val seeded = dict.select(
      array_join(filter(split(col("word"), ""), x => x =!= ""), " ").as("sym"),
      col("freq"))
    var cur = MemoFrames.materialize(spark, "bpe_dict", seeded)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val arr = split(col("sym"), " ")
      // §2.Z guard: sequence(1, n) counts DOWN for n < 1 — single-symbol
      // words must contribute an empty pair array, not junk
      val pairs = when(size(arr) >= 2,
        transform(sequence(lit(1), size(arr) - 1),
          i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
        .otherwise(array())
      // headOption, not head (round-11 session 2, EmptyInputSpec): a
      // corpus that runs out of adjacent pairs before the requested
      // round count — empty dict, or every word already fused to one
      // symbol — must END the training, not throw on the empty argmax
      cur.select(explode(pairs).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect().headOption match {
        case None => exhausted = true
        case Some(top) =>
          val Array(l, rgt) = top.getString(0).split(" ", 2)
          merges += ((r.toLong, l, rgt, top.getLong(1)))
          val pat = "(?<![^ ])" + java.util.regex.Pattern.quote(l + " " + rgt) + "(?![^ ])"
          // lazily chain the merge; the NEXT round's argmax evaluates it —
          // k chained vocab-bounded projections, no per-round write
          cur = cur.select(
            regexp_replace(col("sym"), pat, l + rgt).as("sym"), col("freq"))
      }
    }
    merges.toSeq
  }

  /** The training corpus's word-frequency dict (lowercased alphanumeric
    * words) — the ONE corpus touch both the trainer and the encoder
    * normalize through, so trained merges apply to exactly the symbol
    * stream they were learned on. */
  private def corpusDict(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Declared instance: 8 merges over the documents corpus (lowercased
    * alphanumeric words). */
  def llmBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, corpusDict(spark, dir), 8)
    val session = spark
    import session.implicits._
    merges.toDF("round", "left", "right", "freq")
      .orderBy(col("round").asc)
  }

  /** The trained merge table as a MEMOIZED session artifact (round 14):
    * a tokenizer's merge list is the artifact a training run SHIPS — the
    * encode step (and any future consumer) reads it, it does not retrain.
    * Warmed through SharedArtifacts like bm25_post; llm_bpe_train itself
    * stays the honest in-query training loop. */
  private[operators] def mergeTable(spark: SparkSession, dir: String): DataFrame =
    MemoFrames.frame(spark, s"bpe_merges|$dir") {
      val merges = bpeMerges(spark, corpusDict(spark, dir), 8)
      val session = spark
      import session.implicits._
      merges.toDF("round", "left", "right", "freq")
    }

  /** Apply a trained merge list to a (word, freq) dict — greedy BPE
    * ENCODE: seed each word as characters, then apply every merge in
    * TRAINING ORDER with the trainer's own left-to-right non-overlapping
    * boundary-guarded replacement. Applying in training order over the
    * full dict is exactly the state evolution the training loop itself
    * performs, so encode(training corpus) ≡ the trainer's final dict
    * state by construction (pinned in BpeEncodeSpec against a scalar
    * replay). Returns (word, freq, sym, n_sym). */
  private[graft] def encodeDict(dict: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val seeded = dict.select(col("word"), col("freq"),
      array_join(filter(split(col("word"), ""), x => x =!= ""), " ").as("sym"))
    val encoded = merges.foldLeft(seeded) { case (df, (l, r)) =>
      val pat = "(?<![^ ])" + java.util.regex.Pattern.quote(l + " " + r) + "(?![^ ])"
      df.withColumn("sym", regexp_replace(col("sym"), pat, l + r))
    }
    encoded.withColumn("n_sym",
      size(filter(split(col("sym"), " "), x => x =!= "")).cast("long"))
  }

  /** SURVEY §2 addendum (round 14, VERDICT r13 task 2) — BPE ENCODE: the
    * missing second half of the tokenizer family. llm_bpe_train LEARNS
    * the merge table; a corpus build then TOKENIZES with it to get real
    * token budgets (the whitespace/regex counts in llm_tokenize are
    * conventions, not the trained vocabulary). Applies the 8 trained
    * merges (memoized artifact) to the corpus vocabulary and reports the
    * per-language token budget: documents, whitespace tokens, seeded
    * characters, encoded BPE tokens, and the chars-per-token compression
    * the trained vocabulary achieves.
    *
    * Scale shape: the merge application runs over the VOCABULARY (the
    * explode→hash-agg dict — vocabulary-bounded at any corpus size), as
    * 8 chained map-side regexp projections; the corpus-grain pass is one
    * explode + a BROADCAST join of (word → n_sym) — the encoded dict is
    * dictionary-sized — followed by a lang-grain hash agg with map-side
    * partials. Driver state: the 8-row merge list (codebook class). At
    * 100 TB nothing here grows beyond the vocabulary except the one
    * corpus scan every llm_* text op already pays.
    *
    * NO-ORACLE (16th): the merge table is the data-dependent training
    * loop's output (the llm_bpe_train allowance); BpeEncodeSpec pins
    * encode ≡ scalar merge replay, the merge-free identity (0 merges ⇒
    * n_sym = word length), partition invariance, and the corpus-level
    * conservation law (ws_tokens ≤ bpe_tokens ≤ chars). */
  def llmBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = mergeTable(spark, dir)
      .orderBy(col("round").asc)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val encoded = encodeDict(corpusDict(spark, dir), merges)
      .select(col("word"), col("n_sym"), length(col("word")).cast("long").as("n_chars"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(encoded), "word")
      .groupBy("lang")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("ws_tokens"),
        sum("n_chars").as("chars"),
        sum("n_sym").as("bpe_tokens"),
        round(sum("n_chars").cast("double") / sum("n_sym"), 6).as("chars_per_token"))
      .orderBy(col("lang").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_bpe_train" -> (llmBpeTrain _),
    "llm_bpe_encode" -> (llmBpeEncode _))

  val oracleSql: Map[String, String] = Map.empty
}
