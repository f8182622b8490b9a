package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A media payload row: opaque bytes + typed metadata — the "multimodal
  * column" shape (binary content, schema'd sidecar fields). */
case class MediaRow(doc_id: Long, lang: String, mime: String, media: Array[Byte])

/** Decoded per-item features produced by the (stubbed) decoder. */
case class MediaFeatures(doc_id: Long, lang: String, n_bytes: Long,
                         width: Int, height: Int, features: Array[Float])

/** Multimodal-column pipeline (task mandate: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract
  * runs batch-wise per partition).
  *
  * The Spark-side plumbing is real: a typed `Dataset[MediaRow]` with a
  * binary column, `mapPartitions` batch processing (the Scala analog of
  * `mapInPandas` — one iterator per partition, so a real codec would
  * amortize model/codec init per partition, not per row), and a typed
  * `Dataset[MediaFeatures]` out. Only the codec itself is STUBBED — this
  * container has no image/audio libraries — as a deterministic fake
  * (documented below), exactly as the task prescribes.
  *
  * Scale notes: decode is embarrassingly partition-parallel; the binary
  * column never shuffles (features are extracted before any wide
  * operation); metadata-only queries prune the binary column at the scan.
  */
object Multimodal {

  /** Media table: the documents' text bytes stand in for an image payload
    * (same plumbing; a real ingest would read image files into `media`). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), lit("image/png").as("mime"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** STUB — in production this is the image decoder + feature extractor
    * (e.g. libjpeg + a vision encoder); neither exists in this container.
    * The fake is DETERMINISTIC in the payload bytes so tests can assert
    * exact results: fake dimensions from the byte length, 8 "features" =
    * strided byte sums normalized to [0,1). The signature (bytes in,
    * fixed-size Float vector out) is the real contract. */
  private[graft] def decodeStub(media: Array[Byte]): (Int, Int, Array[Float]) = {
    val width = 16 + (media.length % 64)
    val height = 16 + ((media.length / 64) % 64)
    val feats = Array.tabulate(8) { i =>
      var s = 0L
      var j = i
      while (j < media.length) { s += (media(j) & 0xff); j += 8 }
      (s % 1000).toFloat / 1000.0f
    }
    (width, height, feats)
  }

  /** Batch decode: one decoder invocation stream per partition
    * (`mapPartitions` = the mapInPandas batch shape). */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition init would go here (codec/model handles)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.lang, r.media.length.toLong, w, h, f)
      }
    }
  }

  /** Declared query: per-lang stats over decoded features. No-oracle (the
    * stub decoder is not SQL-expressible); the driver's rows-only check
    * plus MultimodalSpec cover it. */
  def llmMmFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeAll(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        round(avg("n_bytes"), 6).as("avg_bytes"),
        round(avg(col("width")), 6).as("avg_w"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"),
        round(avg(aggregate(col("features").cast("array<double>"), lit(0.0),
          (acc, x) => acc + x * x)), 6).as("avg_sq_norm"))
      .orderBy(col("lang").asc)

  /** Resized media row (stub resize — see resizeAll). */
  case class MediaResized(doc_id: Long, lang: String, w: Int, h: Int,
                          tw: Int, th: Int, out_bytes: Long)

  /** Batch RESIZE (task mandate's third multimodal op): fit each item
    * into a 64×64 box preserving aspect ratio, integer arithmetic. The
    * pixel work is stubbed (no image libs), but the dimensions flow is
    * the real contract — and because the stub dims derive arithmetically
    * from the payload byte length, the declared query is fully
    * DuckDB-oracle-able (strlen = octet_length), unlike the feature
    * stub. Same mapPartitions batch shape as decodeAll. */
  def resizeAll(spark: SparkSession, dir: String): Dataset[MediaResized] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _) = decodeStub(r.media)
        val mx = math.max(w, h)
        val (tw, th) = if (mx <= 64) (w, h) else (w * 64 / mx, h * 64 / mx)
        MediaResized(r.doc_id, r.lang, w, h, tw, th, tw.toLong * th)
      }
    }
  }

  /** Declared query: per-lang resize report — target dims and the
    * compression the 64×64 bound buys. */
  def llmMmResize(spark: SparkSession, dir: String): DataFrame =
    resizeAll(spark, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        round(avg("tw"), 6).as("avg_tw"),
        round(avg("th"), 6).as("avg_th"),
        round(avg(col("out_bytes").cast("double") /
          (col("w").cast("double") * col("h"))), 6).as("avg_ratio"))
      .orderBy(col("lang").asc)

  /** FRAME-SAMPLE (task mandate's fourth multimodal op): treat the
    * payload as fixed-256-byte frames (a stub video container), keep
    * every s-th frame with s sized so ≤8 frames survive — the uniform
    * temporal sampling every video pipeline runs before encoding.
    * Counts are integer arithmetic in the byte length, so the declared
    * query is oracle-able; the per-frame byte slicing itself happens in
    * the typed batch pass (real plumbing, stub decode). */
  def llmMmFramesample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sampled = mediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val frames = (r.media.length + 255) / 256
        val s = math.max(1, frames / 8)
        val kept = (frames + s - 1) / s
        (r.doc_id, r.lang, frames.toLong, kept.toLong)
      }
    }.toDF("doc_id", "lang", "frames", "kept")
    sampled.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        round(avg("frames"), 6).as("avg_frames"),
        round(avg("kept"), 6).as("avg_kept"),
        max("frames").as("max_frames"))
      .orderBy(col("lang").asc)
  }

  /** Content-hash payload dedup (round-9 wave 6) — the storage-level CAS
    * (content-addressable store) audit over the binary media column: a
    * deterministic re-ingest batch (doc_id ≡ 0 mod 7 re-arrives under
    * new ids — the "same crawl landed twice" reality) joins the base
    * table, payloads group by md5 OF THE BYTES, and the per-lang report
    * carries duplicate items and the bytes a CAS would reclaim. The
    * binary column never shuffles raw: only the 16-byte digest and the
    * length leave the map side — THE design rule for multimodal columns
    * at 100 TB (hash travels, payload stays). Oracle-backed because the
    * stub payload is the text's UTF-8 bytes, so DuckDB's md5(text) is
    * byte-identical. */
  def llmMmDedup(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir).toDF().select("doc_id", "lang", "media")
    val base = media.unionAll(
      media.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("media")))
    base
      .select(col("lang"), md5(col("media")).as("h"),
        length(col("media")).cast("long").as("nb"))
      .groupBy("lang", "h")
      .agg(count(lit(1)).as("n"), max("nb").as("payload_bytes"))
      .groupBy("lang")
      .agg(sum("n").as("items"),
        count(lit(1)).as("uniq_payloads"),
        sum(col("n") - 1).as("dup_items"),
        sum(col("n") * col("payload_bytes")).as("total_bytes"),
        sum((col("n") - 1) * col("payload_bytes")).as("dedup_savings"))
      .orderBy(col("lang").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mm_dedup"       -> (llmMmDedup _),
    "llm_mm_features"    -> (llmMmFeatures _),
    "llm_mm_resize"      -> (llmMmResize _),
    "llm_mm_framesample" -> (llmMmFramesample _))

  /** The stub dims are pure integer arithmetic in the UTF-8 byte length
    * (strlen in DuckDB, octet_length in Spark — NOT n_chars: zh docs are
    * multi-byte), so resize and frame-sample get real oracles. */
  val oracleSql: Map[String, String] = Map(
    "llm_mm_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, text FROM documents
        |  WHERE doc_id % 7 = 0),
        |m AS (
        |  SELECT doc_id, lang, md5(text) AS h,
        |    octet_length(encode(text)) AS nb
        |  FROM base),
        |g AS (
        |  SELECT lang, h, count(*) AS n, max(nb) AS payload_bytes
        |  FROM m GROUP BY lang, h)
        |SELECT lang, CAST(sum(n) AS BIGINT) AS items,
        |  count(*) AS uniq_payloads,
        |  CAST(sum(n - 1) AS BIGINT) AS dup_items,
        |  CAST(sum(n * payload_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum((n - 1) * payload_bytes) AS BIGINT) AS dedup_savings
        |FROM g GROUP BY lang ORDER BY lang ASC""".stripMargin,
    "llm_mm_resize" ->
      """WITH d AS (
        |  SELECT lang,
        |    16 + strlen(text) % 64 AS w,
        |    16 + (strlen(text) // 64) % 64 AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, w, h,
        |    CASE WHEN greatest(w, h) <= 64 THEN w ELSE w * 64 // greatest(w, h) END AS tw,
        |    CASE WHEN greatest(w, h) <= 64 THEN h ELSE h * 64 // greatest(w, h) END AS th
        |  FROM d)
        |SELECT lang, count(*) AS n,
        |  round(avg(tw), 6) AS avg_tw,
        |  round(avg(th), 6) AS avg_th,
        |  round(avg(CAST(tw * th AS DOUBLE) / (CAST(w AS DOUBLE) * h)), 6) AS avg_ratio
        |FROM r GROUP BY lang ORDER BY lang ASC""".stripMargin,
    "llm_mm_framesample" ->
      """WITH f AS (
        |  SELECT lang,
        |    (strlen(text) + 255) // 256 AS frames
        |  FROM documents),
        |s AS (
        |  SELECT lang, frames,
        |    (frames + greatest(1, frames // 8) - 1) // greatest(1, frames // 8) AS kept
        |  FROM f)
        |SELECT lang, count(*) AS n,
        |  round(avg(frames), 6) AS avg_frames,
        |  round(avg(kept), 6) AS avg_kept,
        |  CAST(max(frames) AS BIGINT) AS max_frames
        |FROM s GROUP BY lang ORDER BY lang ASC""".stripMargin)
}
