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

  /** Frame sampling: chunk the payload into fixed 16-byte "frames" (the
    * stand-in for video frames / audio windows), keep every 4th frame,
    * and emit per-item sample statistics. Same typed `mapPartitions`
    * batch stage as feature extraction — a real frame decoder would hold
    * its codec open across the partition here — and still shuffle-free.
    * Sampling is deterministic (stride, not random): re-runs and retried
    * tasks pick identical frames, which is what makes the op usable as a
    * pipeline stage at scale. */
  def sampleFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaItem]
      .mapPartitions(items => items.map(MultimodalStub.sampleFrameStats))
      .toDF()
  }

  private val multimodalFrames = QueryDef(
    "q_multimodal_frames",
    (s, d) => sampleFrames(s, d)
      .select(col("doc_id"), col("n_frames"), col("n_sampled"), col("sampled_byte_sum")),
    // Stride-4 sampling of 16-byte frames = the first 16 bytes of every
    // 64-byte block; the ASCII corpus lets DuckDB recompute the sums from
    // the text column (bytes == character codes).
    Some("""SELECT doc_id,
      CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames,
      CAST(((length(text) + 15) // 16 + 3) // 4 AS BIGINT) AS n_sampled,
      CAST(coalesce(list_sum([
          coalesce(list_sum([unicode(c) FOR c IN string_split(substr(text, b * 64 + 1, 16), '')]), 0)
          FOR b IN range(0, (length(text) + 63) // 64)]), 0) AS BIGINT) AS sampled_byte_sum
      FROM documents"""))

  /** Resize: stride-downsample every payload to ≤ 64 bytes — the
    * thumbnail/downscale stage of an image pipeline, as the same typed
    * `mapPartitions` batch stage (a real build swaps the stub for a codec
    * resize; schema and call site stay fixed). The output is the resized
    * BINARY itself plus its metadata, so downstream stages keep operating
    * on a payload column — exactly what decode→resize→embed chains need.
    * Deterministic (stride, not sampling), shuffle-free. */
  def resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaItem]
      .mapPartitions(items => items.map(MultimodalStub.resizeStub))
      .toDF()
  }

  private val multimodalResize = QueryDef(
    "q_multimodal_resize",
    (s, d) => resize(s, d)
      .select(col("doc_id"), col("n_in"), col("n_out"),
        md5(col("resized")).as("fp")),
    // ASCII corpus: resized bytes == the characters at positions
    // 0, stride, 2·stride, …, so DuckDB rebuilds the exact payload from
    // text and md5-matches it byte for byte (both engines hash to
    // lowercase hex; md5('') agrees on empty payloads).
    Some("""WITH c AS (
        SELECT doc_id, text, length(text) AS n,
          greatest((length(text) + 63) // 64, 1) AS stride
        FROM documents),
      r AS (
        SELECT doc_id, n,
          CASE WHEN n = 0 THEN '' ELSE
            array_to_string([substr(text, CAST(i * stride + 1 AS BIGINT), 1)
              FOR i IN range(0, (n + stride - 1) // stride)], '')
          END AS rs
        FROM c)
      SELECT doc_id, CAST(n AS BIGINT) AS n_in,
        CAST(length(rs) AS BIGINT) AS n_out, md5(rs) AS fp
      FROM r"""))

  val all: Seq[QueryDef] = Seq(multimodal, multimodalFrames, multimodalResize)
}

/** Frame-sampling stats for one media item. */
final case class MediaFrameStats(
    doc_id: Long,
    n_frames: Long,
    n_sampled: Long,
    sampled_byte_sum: Long)

/** A resized media item: downsampled payload + size metadata. */
final case class MediaResized(
    doc_id: Long,
    n_in: Long,
    n_out: Long,
    resized: Array[Byte])

/** The stubbed decoder. A production build swaps this object for real
  * codecs; the call site and schema do not change. */
object MultimodalStub {

  private val FRAME = 16
  private val STRIDE = 4
  private val RESIZE_TARGET = 64

  /** STUB resize: keep every stride-th byte so the output is ≤ TARGET
    * bytes (a real implementation decodes and rescales pixels; the
    * stride keeps this deterministic and byte-checkable). */
  def resizeStub(item: MediaItem): MediaResized = {
    val bytes = item.media
    val n = bytes.length
    val stride = math.max((n + RESIZE_TARGET - 1) / RESIZE_TARGET, 1)
    val out = new Array[Byte]((n + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
    MediaResized(item.doc_id, n.toLong, out.length.toLong, out)
  }

  /** STUB frame sampler: fixed-size byte frames, every STRIDE-th kept. */
  def sampleFrameStats(item: MediaItem): MediaFrameStats = {
    val bytes = item.media
    val nFrames = (bytes.length + FRAME - 1) / FRAME
    val nSampled = (nFrames + STRIDE - 1) / STRIDE
    var sum = 0L
    var f = 0
    while (f < nFrames) {
      val start = f * FRAME
      val end = math.min(start + FRAME, bytes.length)
      var i = start
      while (i < end) { sum += bytes(i) & 0xFF; i += 1 }
      f += STRIDE
    }
    MediaFrameStats(item.doc_id, nFrames.toLong, nSampled.toLong, sum)
  }
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
