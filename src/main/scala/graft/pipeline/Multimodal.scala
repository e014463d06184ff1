package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata — the schema shape
  * for image/audio/video columns at 100 TB (payload stays a `binary`
  * column; only metadata is queryable without decode). */
final case class MediaItem(
    doc_id: Long,
    media: Array[Byte],
    format: String,
    n_bytes: Long)

/** Decoded features for one media item. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    mean_byte_e3: Long,
    distinct_bytes: Int)

/** Multimodal-column plumbing: binary payloads with typed metadata, decoded
  * and feature-extracted per partition via a typed `mapPartitions` — the
  * Scala analog of a Pandas-UDF `mapInPandas` batch stage. The partition
  * iterator is the batch boundary: a real decoder (JPEG/PNG/audio frames)
  * would amortize codec/model init across the partition exactly here.
  *
  * The decode step itself is a STUB — no image/audio libraries exist in
  * this environment — replaced by a deterministic byte-statistics fake
  * ([[MultimodalStub.decodeFeatures]]); the Spark-side contract (schema,
  * binary column, partition batching, feature output) is real and tested
  * in PipelineSpec.
  */
object Multimodal {

  /** Build the media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for real image bytes). */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.t(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("utf8-blob").as("format"), octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaItem]
      .toDF()
  }

  /** Feature extraction over the binary column; one `mapPartitions` stage,
    * no shuffle — scales linearly with partition count. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaItem]
      .mapPartitions { items =>
        // Per-partition init happens here (codec handles, model weights...).
        items.map(MultimodalStub.decodeFeatures)
      }
      .toDF()
  }

  private val multimodal = QueryDef(
    "q_multimodal_features",
    (s, d) => extractFeatures(s, d)
      .select(col("doc_id"), col("n_bytes"), col("mean_byte_e3"), col("distinct_bytes")),
    // The corpus is pure ASCII (verified: octet_length(encode(text)) =
    // length(text) for every row), so the UTF-8 payload bytes are exactly
    // the character codes and DuckDB can recompute the stub's byte
    // statistics from the text column — a real value-level oracle for the
    // mapPartitions decode path (plus the independent expectation test in
    // PipelineSpec).
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      CASE WHEN length(text) = 0 THEN 0
        ELSE CAST(list_sum([unicode(c) for c in string_split(text, '')]) * 1000
          // length(text) AS BIGINT) END AS mean_byte_e3,
      CASE WHEN length(text) = 0 THEN 0
        ELSE len(list_distinct(string_split(text, ''))) END AS distinct_bytes
      FROM documents"""))

  val all: Seq[QueryDef] = Seq(multimodal)
}

/** The stubbed decoder. A production build swaps this object for real
  * codecs; the call site and schema do not change. */
object MultimodalStub {
  /** STUB decode: deterministic byte statistics standing in for real
    * decode/feature-extract (e.g. resize + embed for images). */
  def decodeFeatures(item: MediaItem): MediaFeatures = {
    val bytes = item.media
    var sum = 0L
    val seen = new Array[Boolean](256)
    var distinct = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sum += b
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      i += 1
    }
    val mean = if (bytes.isEmpty) 0L else sum * 1000L / bytes.length
    MediaFeatures(item.doc_id, bytes.length.toLong, mean, distinct)
  }
}
