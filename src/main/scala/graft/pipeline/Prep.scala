package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation pipeline, as ONE dataflow:
  *
  *   quality filter -> language filter -> exact dedup -> near-dup drop ->
  *   deterministic split assignment -> per-(split, lang) audit rollup
  *
  * Each stage exists elsewhere as a standalone operator (TextAnalysis,
  * Dedup, Sampling); this composite proves they fuse into a single lazy
  * plan — no materialization barriers between stages, so Catalyst pushes
  * the cheap row-local filters (quality, language) beneath everything and
  * the only shuffles are the two the semantics require (digest groups for
  * exact dedup, shingle buckets inside the near-dup join). That plan shape
  * is the whole point at 100 TB: a pipeline of separately-materialized
  * stages would rewrite the corpus to storage five times.
  *
  * The near-dup drop policy is the greedy pairwise rule: a document is
  * dropped when a *surviving* exact-dedup representative with a smaller
  * doc_id is its near-duplicate (trigram Jaccard >= 0.5). The DuckDB
  * oracle recomputes every stage independently — the pair set from
  * all-pairs Jaccard (feasible at sf0.01) — so the gate checks the whole
  * pipeline's row-level decisions, not just counts.
  */
object Prep {
  private val pipelineE2e = QueryDef(
    "q_pipeline_e2e",
    (s, d) => {
      val t = 0.5
      // Stage 1+2: quality + language gates — row-local, no shuffle;
      // Catalyst pushes them into the parquet scan of every later stage.
      val base = Tables.t(s, d, "documents")
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .filter(col("n_chars") >= 100 && col("lang") =!= "zh" && col("n_toks") >= 20)
      // Stage 3: exact dedup — keep the smallest doc_id per content
      // digest. The digest group-by runs on a NARROW (digest, doc_id)
      // projection, so only 40-byte rows shuffle by digest; the full text
      // then moves once, in the doc_id semi-join — the same partitioning
      // the stage-4 anti join needs, so the text is shuffled exactly once
      // end-to-end. (A window over the digest partition would drag the
      // text through the digest shuffle too.)
      val keepIds = base
        .select(sha2(lower(trim(col("text"))), 256).as("digest"), col("doc_id"))
        .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val exact = base.join(keepIds, Seq("doc_id"), "left_semi")
      // Stage 4: near-dup drop. verifiedPairs is the exact J >= t pair
      // relation (a_id < b_id) — corpus-independent, so restricting the
      // smaller endpoint to survivors equals recomputing pairs on the
      // survivor subset. Anti join drops the larger endpoint.
      val survIds = exact.select(col("doc_id").as("a_id"))
      val drops = Dedup.materializedPairs(s, d, t)
        .join(survIds, "a_id")
        .select(col("b_id").as("doc_id")).distinct()
      val deduped = exact.join(drops, Seq("doc_id"), "left_anti")
      // Stage 5+6: deterministic split (Sampling's shared hash — same
      // function object, so the pipeline's splits can never silently
      // diverge from q_sample_split's) and the audit rollup.
      val bucket = Sampling.splitHash(col("doc_id")) % 10
      deduped
        .withColumn("split",
          when(bucket < 8, "train").when(bucket === 8, "valid").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("sum_toks"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },
    Some(s"""WITH base AS (
        SELECT doc_id, lang, text, n_chars,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
          sha256(lower(trim(text))) AS digest
        FROM documents
        WHERE n_chars >= 100 AND lang <> 'zh'
          AND len(string_split(text, ' ')) >= 20),
      exact AS (
        SELECT * FROM base
        QUALIFY doc_id = min(doc_id) OVER (PARTITION BY digest)),
      ${Dedup.pairsCteSql("exact", 0.5)},
      deduped AS (
        SELECT * FROM exact e
        WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.b_id = e.doc_id))
      SELECT CASE WHEN (doc_id * 40503) % 65536 % 10 < 8 THEN 'train'
                  WHEN (doc_id * 40503) % 65536 % 10 = 8 THEN 'valid'
                  ELSE 'test' END AS split,
        lang, count(*) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS sum_toks,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM deduped GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(pipelineE2e)
}
