package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/valid/test assignment stage
  * of a training-data pipeline. The split must be a pure function of a
  * stable key (never `rand()`: re-runs, retries, and late-arriving shards
  * all have to land each document in the same split), embarrassingly
  * parallel, and skew-free.
  *
  * The hash here is a Fibonacci-style multiplicative mix kept inside small
  * int64 ranges so the oracle can reproduce it in portable SQL (DuckDB
  * errors on int64 overflow where Spark wraps, so the mix avoids overflow
  * by construction). A production pipeline over arbitrary string keys
  * would use `xxhash64(key)` — same shape, same guarantees, not
  * SQL-portable. */
object Sampling {

  /** 80/10/10 split by hashed doc_id, with per-split corpus stats. The
    * aggregation is a two-level rollup: everything before the final 3-row
    * result is map-side partial aggregation — nothing shuffles but the
    * (split, partial) rows. */
  private val sampleSplit = QueryDef(
    "q_sample_split",
    (s, d) => {
      val h = (col("doc_id") * 40503L) % 65536L
      val bucket = h % 10
      Tables.t(s, d, "documents")
        .withColumn("split",
          when(bucket < 8, "train").when(bucket === 8, "valid").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },
    Some("""SELECT CASE WHEN (doc_id * 40503) % 65536 % 10 < 8 THEN 'train'
             WHEN (doc_id * 40503) % 65536 % 10 = 8 THEN 'valid'
             ELSE 'test' END AS split,
        count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(sampleSplit)
}
