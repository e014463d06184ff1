package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Embedding-column transforms beyond similarity search — the storage/
  * serving side of an embedding pipeline.
  *
  * Quantization is the canonical one: int8 symmetric quantization cuts an
  * embedding store to 1/4 the bytes (64 doubles -> 64 int8 + 1 scale) with
  * ~0.3% cosine error, and at 100 TB the embedding store is usually the
  * largest artifact after the text itself. The op is embarrassingly
  * parallel (pure per-row map, no shuffle until the audit projection), and
  * every arithmetic step is either exact integer math or a single IEEE op
  * evaluated in the same order on both engines, so the DuckDB gate checks
  * values bit-for-bit.
  */
object Embeddings {

  /** Per-vector symmetric int8 quantization with audit stats: scale =
    * amax/127, q_i = floor(v_i/amax*127) in [-127, 127] (floor rather
    * than round: round ties break HALF_UP in Spark vs half-even in
    * DuckDB, truncation is bit-stable). Emits the quantized vector's
    * min/max/sum/sum-of-squares — exact int64 — plus the 1e9-truncated
    * scale, rather than the array itself, so the gate compares scalars. */
  private val quantize = QueryDef(
    "q_embed_quantize",
    (s, d) => {
      val e = Tables.t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      // The finiteness guard is explicit on BOTH engines: Spark orders NaN
      // greater than any double but `NaN > 0` is false (row dropped), while
      // DuckDB's total order would keep the row and emit NULL/NaN stats —
      // `amax > 0 AND NOT isnan(amax)` makes the gate corpus-independent.
      e.withColumn("amax", array_max(transform(col("v"), x => abs(x))))
        .filter(col("amax") > 0 && !isnan(col("amax")))
        .withColumn("q", transform(col("v"), x => floor(x / col("amax") * 127)))
        .select(col("vec_id"),
          floor(col("amax") / 127 * 1e9).as("scale_e9"),
          array_min(col("q")).as("qmin"),
          array_max(col("q")).as("qmax"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
          aggregate(col("q"), lit(0L), (a, x) => a + x * x).as("qsq"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        m AS (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        q AS (SELECT vec_id, amax,
                list_transform(v, x -> CAST(FLOOR(x / amax * 127) AS BIGINT)) AS qv
              FROM m WHERE amax > 0 AND NOT isnan(amax))
      SELECT vec_id,
        CAST(FLOOR(amax / 127 * 1e9) AS BIGINT) AS scale_e9,
        CAST(list_min(qv) AS BIGINT) AS qmin,
        CAST(list_max(qv) AS BIGINT) AS qmax,
        CAST(list_sum(qv) AS BIGINT) AS qsum,
        CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS qsq
      FROM q"""))

  val all: Seq[QueryDef] = Seq(quantize)
}
