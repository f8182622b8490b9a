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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mm_features" -> (llmMmFeatures _))

  val oracleSql: Map[String, String] = Map.empty
}
