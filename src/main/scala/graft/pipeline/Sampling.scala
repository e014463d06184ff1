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

  /** The shared deterministic mix: pure function of doc_id, no overflow
    * for any int64 id range used here (kept in one place so the three
    * sampling queries cannot silently diverge; mirrored verbatim in each
    * oracle's SQL). */
  private[pipeline] def splitHash(id: org.apache.spark.sql.Column) =
    (id * 40503L) % 65536L

  /** 80/10/10 split by hashed doc_id, with per-split corpus stats. The
    * aggregation is a two-level rollup: everything before the final 3-row
    * result is map-side partial aggregation — nothing shuffles but the
    * (split, partial) rows. */
  private val sampleSplit = QueryDef(
    "q_sample_split",
    (s, d) => {
      val h = splitHash(col("doc_id"))
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

  /** Stratified sampling with exact per-stratum quotas: the k
    * "first-by-hash-order" documents of every language. rand()-free and
    * reproducible like [[sampleSplit]]; the per-stratum top-k is a
    * partitioned window (row_number over the hash order), so each
    * stratum's selection runs where its rows live — the shuffle carries
    * language keys, and at 100 TB skewed strata are exactly what AQE's
    * skew handling sees. The alternative `df.stat.sampleBy` is
    * probabilistic (no exact quotas, not reproducible across retries). */
  private val sampleStratified = QueryDef(
    "q_sample_stratified",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = splitHash(col("doc_id"))
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      Tables.t(s, d, "documents")
        .withColumn("h", h)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("doc_id"), col("rk"))
    },
    Some("""SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
          ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY (doc_id * 40503) % 65536, doc_id) AS rk
        FROM documents)
      WHERE rk <= 20"""))

  /** Weighted source mixing: down-sample each source to a target fraction
    * (e.g. keep 100% of wiki-like sources, 25% of web crawl) with the same
    * deterministic hash — the "dataset mixture" stage of a training run.
    * Pure map-side filter: no shuffle at all until the audit rollup. */
  private val mixSources = QueryDef(
    "q_mix_sources",
    (s, d) => {
      val bucket = splitHash(col("doc_id")) % 100L
      // Sources are src0..src19 in this corpus; weight a few down the way
      // a real mixture config would (keep 25% of src0-4, 75% of src5-9,
      // everything else whole).
      val srcNum = regexp_extract(col("source"), "\\d+", 0).cast("long")
      val keepPct = when(srcNum < 5, 25L).when(srcNum < 10, 75L).otherwise(100L)
      Tables.t(s, d, "documents")
        .filter(bucket < keepPct)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    },
    Some("""SELECT source, count(*) AS n_kept,
        CAST(sum(n_chars) AS BIGINT) AS kept_chars
      FROM documents
      WHERE (doc_id * 40503) % 65536 % 100 <
        CASE WHEN CAST(regexp_extract(source, '\d+', 0) AS BIGINT) < 5 THEN 25
             WHEN CAST(regexp_extract(source, '\d+', 0) AS BIGINT) < 10 THEN 75
             ELSE 100 END
      GROUP BY 1"""))

  /** Language-temperature rebalancing: per-language sampling weights
    * w_i ∝ n_i^0.5 (temperature α = 0.5, the standard multilingual
    * up-sampling exponent) plus the per-epoch document quota each weight
    * implies. α = 0.5 is deliberate: sqrt is correctly rounded under
    * IEEE 754 (unlike pow/exp/ln), so floor(sqrt(n)·1e6) is bit-identical
    * on both engines, and from there everything is exact int64 — the
    * weight normalization divides scaled integers, never sums floats
    * (a float Σ over languages would be summation-order dependent).
    *
    * Scale shape: the per-language aggregate is map-side partial all the
    * way down to ≤ n_langs rows; the normalizing total is a one-row
    * broadcast (the TPC-H Q11/Q22 threshold pattern). Nothing here grows
    * with corpus size. */
  private val langRebalance = QueryDef(
    "q_lang_rebalance",
    (s, d) => {
      val c = Tables.t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("s_e6",
          floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
      val tot = c.agg(sum(col("s_e6")).as("tot"), sum(col("n_docs")).as("n_total"))
      c.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          expr("s_e6 * 1000000L div tot").as("weight_e6"),
          expr("(s_e6 * 1000000L div tot) * n_total div 1000000L").as("target_docs"))
    },
    Some("""WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(FLOOR(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS s_e6
        FROM documents GROUP BY 1),
      tot AS (
        SELECT CAST(sum(s_e6) AS BIGINT) AS tot,
          CAST(sum(n_docs) AS BIGINT) AS n_total
        FROM c)
      SELECT lang, n_docs, s_e6 * 1000000 // tot AS weight_e6,
        (s_e6 * 1000000 // tot) * n_total // 1000000 AS target_docs
      FROM c, tot"""))

  /** Deterministic shard assignment + reproducible within-shard order —
    * the "shuffle, then shard" writer step of a training-data release.
    * Training wants documents in pseudo-random order, and the order must
    * be REPRODUCIBLE (a re-run of the release, a resumed writer, or a
    * backfilled shard must place every doc at the same position), so the
    * order key is a seeded md5 of the doc id, never `rand()`: shard =
    * top-byte of the hash mod N_SHARDS, pos = rank of the hash within the
    * shard. One hash-partition shuffle + a per-shard sort (each shard
    * sorts independently — the 100 TB shape, where N_SHARDS scales with
    * target file size and no global sort ever happens). md5 is the hash
    * because both engines print it identically; hex digits are folded to
    * ints via instr() on the hex alphabet, the only cross-engine-portable
    * hex decode. */
  private val N_SHARDS = 8
  private val shardShuffle = QueryDef(
    "q_shard_shuffle",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("shard")).orderBy(col("hx"), col("doc_id"))
      Tables.t(s, d, "documents")
        .withColumn("hx",
          md5(concat(lit("graft-shuffle-1:"), col("doc_id").cast("string"))))
        .withColumn("shard",
          (((expr("instr('0123456789abcdef', substring(hx, 1, 1))") - 1) * 16 +
            (expr("instr('0123456789abcdef', substring(hx, 2, 1))") - 1)) % N_SHARDS)
            .cast("long"))
        .select(col("doc_id"), col("shard"),
          row_number().over(w).cast("long").as("pos"))
    },
    Some(s"""WITH h AS (
        SELECT doc_id,
          md5('graft-shuffle-1:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents),
      sh AS (
        SELECT doc_id, hx,
          ((instr('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substring(hx, 2, 1)) - 1)) % $N_SHARDS AS shard
        FROM h)
      SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) AS pos
      FROM sh"""))

  /** The 8-hex-digit → int64 fold, generated once for BOTH engines so the
    * Spark expression and the oracle SQL cannot drift: instr() on the hex
    * alphabet is the only cross-engine-portable hex decode (see
    * [[shardShuffle]]). Result < 2^32, exact in int64 everywhere. */
  private[graft] def hexFold(hxCol: String): String =
    (1 to 8).map(i =>
      s"(CAST(instr('0123456789abcdef', substring($hxCol, $i, 1)) AS BIGINT) - 1) * " +
        (1L << (4 * (8 - i)))).mkString(" + ")

  /** Weighted sampling WITHOUT replacement — the "sample documents
    * proportional to quality/length weight" stage of mixture
    * construction. Priority sampling, determinized: each doc gets an
    * integer weight w (length-banded 1..10 here; any integer weight
    * works), a 32-bit uniform key from a seeded md5 of its id, and
    * priority = key div w — uniform on [0, 2^32/w), so low priorities
    * concentrate on heavy docs and the global bottom-k is an
    * (approximately) w-proportional sample for k << N. Deterministic by
    * construction: re-runs, retries, and backfills select the identical
    * set (`rand()`-based weighted sampling cannot promise that), and the
    * whole query is a map pass + TakeOrderedAndProject (per-partition
    * bottom-k, k-row driver merge — the corpus itself never shuffles).
    * The oracle replays the same fold/div/limit; ties are impossible
    * (doc_id breaks them), so the selected SET is well-defined. */
  private val sampleWeighted = QueryDef(
    "q_sample_weighted",
    (s, d) => {
      Tables.t(s, d, "documents")
        .withColumn("hx",
          md5(concat(lit("graft-wsample-1:"), col("doc_id").cast("string"))))
        .withColumn("w", least(lit(1L) + expr("n_chars div 400"), lit(10L)))
        .withColumn("priority", expr(s"(${hexFold("hx")}) div w"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("w"), col("priority"))
    },
    Some(s"""WITH h AS (
        SELECT doc_id,
          least(1 + n_chars // 400, 10) AS w,
          md5('graft-wsample-1:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents)
      SELECT doc_id, w, (${hexFold("hx")}) // w AS priority
      FROM h ORDER BY priority, doc_id LIMIT 100"""))

  /** LEAKAGE-SAFE train/valid/test split: hash-split like [[sampleSplit]],
    * but the split key is the near-dup CLUSTER's canonical id
    * (min doc_id in the component, [[Dedup.clusterLabelsCached]]) rather
    * than the document's own id — every member of a duplicate cluster
    * lands in the same split, so a test document can never have a near-dup
    * twin sitting in train (the eval-contamination channel a plain
    * per-document split leaves open; the standard hygiene rule behind
    * group-aware splitting). Unclustered documents split by their own id,
    * identically to [[sampleSplit]].
    *
    * Scale: the labels come from the persisted per-corpus store (built
    * once, like the shingle index); this query is then one doc_id-keyed
    * left join (labels are cluster members only — the overwhelming
    * minority — so AQE broadcasts them at any realistic dup rate) plus a
    * map-side hash projection. Oracle: the same recursive-CTE components
    * the clustering oracle computes, joined and split by the same
    * portable hash. */
  private val splitLeakageSafe = QueryDef(
    "q_split_leakage_safe",
    (s, d) => {
      val labels = Dedup.clusterLabelsCached(s, d)
      val key = coalesce(col("cluster_id"), col("doc_id"))
      val bucket = splitHash(key) % 10
      Tables.t(s, d, "documents")
        .join(labels, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          when(bucket < 8, "train").when(bucket === 8, "valid")
            .otherwise("test").as("split"))
    },
    Some(s"""WITH RECURSIVE ${Dedup.pairsCteSql("documents", 0.5)},
      edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT u, u FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
      comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
               FROM reach GROUP BY src)
      SELECT d.doc_id,
        CASE WHEN (COALESCE(c.cluster_id, d.doc_id) * 40503) % 65536 % 10 < 8
               THEN 'train'
             WHEN (COALESCE(c.cluster_id, d.doc_id) * 40503) % 65536 % 10 = 8
               THEN 'valid'
             ELSE 'test' END AS split
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id"""))

  /** Leakage CERTIFICATE for the split family: per split scheme, how many
    * verified near-dup pairs (J ≥ 0.5, the family threshold) END UP WITH
    * THEIR ENDPOINTS IN DIFFERENT SPLITS — the eval-contamination channel
    * itself, measured. The per-document hash split ([[sampleSplit]]'s
    * rule) leaks by construction (a near-dup twin of a test doc can land
    * in train); the cluster-keyed split ([[splitLeakageSafe]]) must
    * measure EXACTLY ZERO cross-split pairs, because both endpoints of
    * every pair share a component and therefore a split key. This is the
    * certification-query pattern (recall cert, sketch certs, cc A/B)
    * applied to split hygiene — the number a data lead checks before
    * trusting an eval score.
    *
    * Scale shape: the pair relation rides the persisted
    * [[Dedup.materializedPairs]] store; each scheme is two doc_id-keyed
    * equi joins of that (long, long) relation against a narrow
    * (doc_id, split) projection plus a 1-row rollup. Nothing is
    * corpus-grain beyond the map-side split projection. */
  private val splitLeakageCert = QueryDef(
    "q_split_leakage_cert",
    (s, d) => {
      val pairs = Dedup.materializedPairs(s, d, 0.5)
        .select(col("a_id"), col("b_id")).localCheckpoint()
      val bucket = splitHash(col("doc_id")) % 10
      val naive = Tables.t(s, d, "documents").select(col("doc_id"),
        when(bucket < 8, "train").when(bucket === 8, "valid")
          .otherwise("test").as("split"))
      def cert(scheme: String, asg: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame =
        pairs
          .join(asg.select(col("doc_id").as("a_id"), col("split").as("sa")), "a_id")
          .join(asg.select(col("doc_id").as("b_id"), col("split").as("sb")), "b_id")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_cross"))
          .select(lit(scheme).as("scheme"), col("n_pairs"), col("n_cross"),
            expr("n_cross * CAST(1000000 AS BIGINT) div greatest(n_pairs, 1)")
              .as("leak_e6"))
      cert("per_doc", naive).union(
        cert("per_cluster", splitLeakageSafe.build(s, d)))
    },
    Some(s"""WITH RECURSIVE ${Dedup.pairsCteSql("documents", 0.5)},
      edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT u, u FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
      comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
               FROM reach GROUP BY src),
      asg AS (
        SELECT d.doc_id,
          CASE WHEN (d.doc_id * 40503) % 65536 % 10 < 8 THEN 'train'
               WHEN (d.doc_id * 40503) % 65536 % 10 = 8 THEN 'valid'
               ELSE 'test' END AS s_doc,
          CASE WHEN (COALESCE(c.cluster_id, d.doc_id) * 40503) % 65536 % 10 < 8
                 THEN 'train'
               WHEN (COALESCE(c.cluster_id, d.doc_id) * 40503) % 65536 % 10 = 8
                 THEN 'valid'
               ELSE 'test' END AS s_cl
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
      j AS (
        SELECT a.s_doc AS sa_doc, b.s_doc AS sb_doc,
          a.s_cl AS sa_cl, b.s_cl AS sb_cl
        FROM pairs p
          JOIN asg a ON p.a_id = a.doc_id
          JOIN asg b ON p.b_id = b.doc_id)
      SELECT 'per_doc' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN sa_doc <> sb_doc THEN 1 ELSE 0 END) AS BIGINT)
          AS n_cross,
        (CAST(SUM(CASE WHEN sa_doc <> sb_doc THEN 1 ELSE 0 END) AS BIGINT)
          * 1000000) // GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS leak_e6
      FROM j
      UNION ALL
      SELECT 'per_cluster' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN sa_cl <> sb_cl THEN 1 ELSE 0 END) AS BIGINT)
          AS n_cross,
        (CAST(SUM(CASE WHEN sa_cl <> sb_cl THEN 1 ELSE 0 END) AS BIGINT)
          * 1000000) // GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS leak_e6
      FROM j"""))

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public): score every raw
    * document by how much its hashed-n-gram feature distribution looks like
    * a TARGET distribution (here: the corpus's `lang = 'en'` slice standing
    * in for "high-quality target domain"), then keep the top-scoring docs.
    * Features are hashed unigrams in [[DSIR_B]] buckets (the portable
    * seeded-md5 fold — see [[shardShuffle]]); per-bucket importance weight
    * is the add-one-smoothed log-likelihood ratio
    * ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)), floor-truncated at 1e-6 once
    * per bucket (the tfidf/bm25 ln-parity convention); a document's score
    * is the exact integer sum of its token instances' bucket weights, and
    * selection is the top-[[DSIR_SEL]] by (score desc, doc_id) — a total
    * order, so both engines pick the identical set.
    *
    * Scale shape: token instances are consumed twice (two parquet scans)
    * and BOTH consumers collapse them map-side before any exchange —
    * bucket stats partial-aggregate to ≤ B = 1024 rows per partition
    * (so token instances never shuffle on the low-cardinality bucket key,
    * a skew trap at corpus grain), and doc scores partial-aggregate to one
    * row per partition-local doc, so the scoring exchange carries
    * docs-grain rows only. Totals derive from the 1024-row stats; the
    * weight table broadcasts. Final selection is TakeOrderedAndProject
    * (per-partition top-k, k-row driver merge); the rank window runs on
    * the LIMIT-bounded 100-row relation, never the corpus. */
  private val DSIR_B = 1024
  private val DSIR_SEL = 100
  private val dsirSelect = QueryDef(
    "q_dsir_select",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DoubleType
      // Token instances stay un-materialized: both consumers aggregate
      // them map-side (bucket stats collapse to <= B rows per partition,
      // doc scores to one row per partition-local doc), so no corpus-
      // grain exchange exists anywhere — an intermediate per-(doc, b)
      // groupBy would add one and, unpersisted, be recomputed per
      // consumer anyway.
      // Feature extraction is the compiled kernel (VERDICT r12 #2): one
      // byte scan + one digest per token instance, emitting bucket ids
      // directly — the interpreted filter() HOF, per-token explode/concat,
      // md5 hex string, and 8-term hex fold all collapse into
      // graft_dsir_buckets; the exploded rows carry a bare bigint.
      val toks = Tables.spreadForRowCpu(Tables.t(s, d, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(call_function("graft_dsir_buckets",
            col("text"), lit("graft-dsir-1:"), lit(DSIR_B))).as("b"))
      val bs = toks.groupBy(col("b")).agg(
        count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val tot = bs.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      val w = bs.crossJoin(broadcast(tot)).select(col("b"),
        floor((log((col("ct") + 1L).cast(DoubleType) /
            (col("nt") + lit(DSIR_B.toLong)).cast(DoubleType)) -
          log((col("cr") + 1L).cast(DoubleType) /
            (col("nr") + lit(DSIR_B.toLong)).cast(DoubleType))) * 1e6)
          .cast("long").as("w_e6"))
      toks.join(broadcast(w), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(col("w_e6")).as("score_e6"))
        .orderBy(col("score_e6").desc, col("doc_id")).limit(DSIR_SEL)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("score_e6").desc, col("doc_id"))).cast("long"))
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, lang,
          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents),
      h AS (SELECT doc_id, lang, md5('graft-dsir-1:' || tok) AS hx FROM toks),
      g AS (SELECT doc_id, lang, (${hexFold("hx")}) % $DSIR_B AS b,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM h GROUP BY 1, 2, 3),
      bs AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cr,
               CAST(SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT) AS ct
             FROM g GROUP BY 1),
      tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
              FROM bs),
      w AS (SELECT b,
              CAST(FLOOR((ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $DSIR_B AS DOUBLE))
                - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $DSIR_B AS DOUBLE))) * 1e6)
                AS BIGINT) AS w_e6
            FROM bs, tot),
      sc AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_toks,
               CAST(SUM(n * w_e6) AS BIGINT) AS score_e6
             FROM g JOIN w USING (b) GROUP BY 1)
      SELECT doc_id, n_toks, score_e6,
        CAST(ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rn
      FROM sc ORDER BY score_e6 DESC, doc_id LIMIT $DSIR_SEL"""))

  /** Domain-mixture reweighting, the DoReMi shape (Xie et al., NeurIPS
    * 2023): measure each domain's EXCESS loss over a reference and
    * up-weight the domains the model finds hardest, so the training mix
    * spends its budget where loss remains. Proxy loss here is the corpus
    * add-one bigram LM (the q_perplexity_lm cost discipline — per-bigram
    * units floored once at 1e-6, per-domain totals exact integer sums);
    * the reference is the token-weighted global mean NLL. DoReMi's
    * exponentiated-gradient update is replaced by a deterministic additive
    * surrogate — weight ∝ 1e6 + excess_e6 — so the output is a pure
    * integer function of the corpus (exact-oracle-able), while keeping
    * the defining monotonicity: harder domain ⇒ larger weight.
    *
    * Scale shape: bigram instances collapse map-side to (source, prev,
    * cur) grain — #domains × bigram-vocab rows, never corpus grain — and
    * every later exchange is bigram-vocab- or domain-bound; the LM cost
    * table joins at that same grain, the domain rollup is ≤ #domains
    * rows, and the reference/normalizer scalars broadcast (the Q11/Q22
    * pattern). Nothing is all-pairs, nothing collects. */
  private val domainMix = QueryDef(
    "q_domain_mix",
    (s, d) => {
      import org.apache.spark.sql.types.DoubleType
      // The (source, prev, cur, n) aggregate comes from the shared bigram
      // store (TextAnalysis.bigramStore — this query's EXACT grain): one
      // corpus explode per JVM, and the two consumers below (c2 chain +
      // per-domain rollup) scan the vocab-bound store instead of sharing
      // a corpus-grain exchange.
      val g = TextAnalysis.bigramStore(s, d)
      val c2 = g.groupBy(col("prev"), col("cur")).agg(sum(col("n")).as("c2"))
      val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
      val v = c2.agg(countDistinct(col("cur")).as("v"))
      val cost = c2.join(c1, "prev").crossJoin(broadcast(v))
        .select(col("prev"), col("cur"),
          floor(log((col("c1") + col("v")).cast(DoubleType) /
            (col("c2") + lit(1L)).cast(DoubleType)) * 1e6)
            .cast("long").as("cost_e6"))
      val dom = g.join(cost, Seq("prev", "cur"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_bigrams"),
          sum(col("n") * col("cost_e6")).as("se"))
      val glob = dom.agg(expr("sum(se) div sum(n_bigrams)").as("gnll"))
      val x = dom.crossJoin(broadcast(glob))
        .select(col("source"), col("n_bigrams"),
          expr("se div n_bigrams").as("nll_e6"),
          greatest(lit(0L), expr("se div n_bigrams") - col("gnll"))
            .as("excess_e6"))
      val tot = x.agg(sum(lit(1000000L) + col("excess_e6")).as("s"))
      x.crossJoin(broadcast(tot))
        .select(col("source"), col("n_bigrams"), col("nll_e6"),
          col("excess_e6"),
          expr("(CAST(1000000 AS BIGINT) + excess_e6) * CAST(1000000 AS BIGINT) div s")
            .as("weight_e6"))
    },
    Some("""WITH t AS (
        SELECT source, list_filter(string_split(text, ' '), x -> x != '') AS toks
        FROM documents),
      f AS (SELECT source, toks, len(toks) AS n FROM t WHERE len(toks) >= 2),
      inst AS (
        SELECT source, toks[CAST(i + 1 AS BIGINT)] AS prev,
          toks[CAST(i + 2 AS BIGINT)] AS cur
        FROM f, unnest(range(0, n - 1)) AS u(i)),
      g AS (SELECT source, prev, cur, CAST(count(*) AS BIGINT) AS n
            FROM inst GROUP BY 1, 2, 3),
      c2 AS (SELECT prev, cur, CAST(sum(n) AS BIGINT) AS c2 FROM g GROUP BY 1, 2),
      c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      v AS (SELECT CAST(count(DISTINCT cur) AS BIGINT) AS v FROM c2),
      cost AS (
        SELECT c2.prev, c2.cur,
          CAST(FLOOR(ln(CAST(c1.c1 + v.v AS DOUBLE) / CAST(c2.c2 + 1 AS DOUBLE))
            * 1e6) AS BIGINT) AS cost_e6
        FROM c2 JOIN c1 ON c2.prev = c1.prev, v),
      dom AS (
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_bigrams,
          CAST(SUM(n * cost_e6) AS BIGINT) AS se
        FROM g JOIN cost USING (prev, cur) GROUP BY 1),
      gref AS (
        SELECT CAST(SUM(se) AS BIGINT) // CAST(SUM(n_bigrams) AS BIGINT) AS gnll
        FROM dom),
      x AS (
        SELECT source, n_bigrams, se // n_bigrams AS nll_e6,
          GREATEST(0, se // n_bigrams - (SELECT gnll FROM gref)) AS excess_e6
        FROM dom),
      tot AS (SELECT CAST(SUM(1000000 + excess_e6) AS BIGINT) AS s FROM x)
      SELECT source, n_bigrams, nll_e6, excess_e6,
        (1000000 + excess_e6) * 1000000 // (SELECT s FROM tot) AS weight_e6
      FROM x"""))

  /** Curriculum phases: split the corpus into 4 difficulty quartiles of
    * the bigram-LM NLL (easy → hard, the classic curriculum-learning
    * order; per-doc difficulty reused VERBATIM from q_perplexity_lm's
    * build and oracle). The quartile boundaries are EXACT distributed
    * quantiles with no corpus-cardinality sort: score-grain counts roll
    * up to a bucketed two-phase cumulative (the q_quality_auc
    * discipline — the only global window runs at bucket grain, ≤ a few
    * hundred rows), boundary q = min score whose cumulative count
    * satisfies 4·cum ≥ q·N (all-integer ceil), and phase assignment is
    * a map-side CASE against the 1-row broadcast boundary set. Docs
    * sharing a boundary score land in the lower phase (score-granular
    * split — deterministic, engine-independent). */
  private val CUR_BKT = 100000L
  private val curriculum = QueryDef(
    "q_curriculum",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      def defOf(mod: Seq[QueryDef], n: String) = mod.find(_.name == n).get
      // Score once (three consumers below re-run the whole perplexity
      // model build otherwise — the q_ccnet_buckets probe finding; same
      // fix, see its scaladoc). Scores come from the persisted
      // TextAnalysis.nllStore — one model build per corpus per JVM.
      val nll = TextAnalysis.nllStore(s, d)
        .select(col("doc_id"), col("nll_e6"))
        .localCheckpoint()
      val g = nll.groupBy(col("nll_e6")).agg(count(lit(1)).as("c"))
        .withColumn("bkt", expr(s"nll_e6 div $CUR_BKT"))
      val bktBelow = g.groupBy(col("bkt")).agg(sum(col("c")).as("bc"))
        .withColumn("below_bkt", coalesce(sum(col("bc")).over(
          Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("bkt"), col("below_bkt"))
      val cum = g.join(bktBelow, Seq("bkt"))
        .withColumn("below_in", coalesce(sum(col("c")).over(
          Window.partitionBy(col("bkt")).orderBy(col("nll_e6"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("cum", col("below_bkt") + col("below_in") + col("c"))
      val tot = nll.agg(count(lit(1)).as("n"))
      val b = cum.crossJoin(broadcast(tot)).agg(
        min(when(col("cum") * 4 >= col("n"), col("nll_e6"))).as("b1"),
        min(when(col("cum") * 4 >= col("n") * 2, col("nll_e6"))).as("b2"),
        min(when(col("cum") * 4 >= col("n") * 3, col("nll_e6"))).as("b3"))
      nll.crossJoin(broadcast(b)).crossJoin(broadcast(tot))
        .withColumn("phase",
          when(col("nll_e6") <= col("b1"), 1L)
            .when(col("nll_e6") <= col("b2"), 2L)
            .when(col("nll_e6") <= col("b3"), 3L).otherwise(4L))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("nll_e6")).as("lo_nll_e6"),
          max(col("nll_e6")).as("hi_nll_e6"),
          expr("sum(nll_e6) div count(1)").as("mean_nll_e6"),
          expr("count(1) * CAST(1000000 AS BIGINT) div first(n)")
            .as("share_e6"))
    },
    Some {
      def defOf(mod: Seq[QueryDef], n: String) = mod.find(_.name == n).get
      val perpSql = defOf(TextAnalysis.all, "q_perplexity_lm").oracle.get
      s"""WITH nllsrc AS ($perpSql),
        nll AS (SELECT doc_id, nll_e6 FROM nllsrc),
        g AS (SELECT nll_e6, CAST(COUNT(*) AS BIGINT) AS c
              FROM nll GROUP BY 1),
        cum AS (
          SELECT nll_e6, c,
            CAST(SUM(c) OVER (ORDER BY nll_e6) AS BIGINT) AS cum
          FROM g),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
        b AS (SELECT
            MIN(CASE WHEN cum * 4 >= (SELECT n FROM tot) THEN nll_e6 END) AS b1,
            MIN(CASE WHEN cum * 4 >= (SELECT n FROM tot) * 2 THEN nll_e6 END) AS b2,
            MIN(CASE WHEN cum * 4 >= (SELECT n FROM tot) * 3 THEN nll_e6 END) AS b3
          FROM cum),
        ph AS (
          SELECT CAST(CASE WHEN nll_e6 <= b1 THEN 1
            WHEN nll_e6 <= b2 THEN 2
            WHEN nll_e6 <= b3 THEN 3 ELSE 4 END AS BIGINT) AS phase, nll_e6
          FROM nll, b)
        SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(nll_e6) AS lo_nll_e6, MAX(nll_e6) AS hi_nll_e6,
          CAST(SUM(nll_e6) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
            AS mean_nll_e6,
          CAST(COUNT(*) AS BIGINT) * 1000000 // (SELECT n FROM tot)
            AS share_e6
        FROM ph GROUP BY 1"""
    })

  /** Repeat-epoch allocation under a fixed token budget (Muennighoff et
    * al., NeurIPS 2023, "Scaling Data-Constrained Language Models" —
    * public). When the training budget exceeds the unique corpus, decide
    * how many EPOCHS of each source to take: repeated tokens are worth
    * geometrically less (decay 0.6 per re-read, the paper's
    * diminishing-returns law in e6 fixed point — the POW/SUMPOW tables
    * below are its exact integer powers and partial sums, derivable as
    * p(0)=1e6, p(e)=p(e-1)*600000 div 1e6). Every (source, epoch) pair
    * carries marginal value n_tokens·decay^epoch; pairs are taken in
    * (marginal desc, source, epoch) order until the FIRST pair that
    * overflows the budget B = 2.5 × total tokens. Prefix-stop rather
    * than skip-and-continue makes the greedy a pure cumulative-sum
    * predicate over a totally-ordered 40-row relation — deterministic
    * and oracle-exact — instead of a sequential knapsack; epochs are
    * capped at [[EP_MAX]]. This completes the mixing quartet: WHAT data
    * (q_dsir_select), at WHICH weight (q_domain_mix), in WHAT order
    * (q_curriculum), and — here — HOW OFTEN.
    *
    * Scale shape: the corpus collapses map-side to #sources token
    * counts (one partial-agg exchange of ≤ #sources keys); the
    * allocation itself runs on #sources × EP_MAX rows — the one global
    * window is over that ≤40-row relation (the hybrid-retrieval
    * LIMIT-relation precedent), and the budget/total scalars broadcast
    * (the Q22 shape). Nothing corpus-grain moves after the first
    * aggregate. */
  private val EP_MAX = 8
  private val POW_E6 = Seq(1000000L, 600000L, 360000L, 216000L, 129600L,
    77760L, 46656L, 27993L)
  private val SUMPOW_E6 = POW_E6.scanLeft(0L)(_ + _) // index = epochs taken
  private val repeatAllocation = QueryDef(
    "q_repeat_allocation",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val src = Tables.t(s, d, "documents")
        .select(col("source"),
          size(expr("filter(split(text, ' '), x -> x != '')"))
            .cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      val b = src.agg(expr("sum(n_tokens) * 2500000L div 1000000L").as("b"))
      val powArr = POW_E6.map(p => s"${p}L").mkString("array(", ", ", ")")
      val spArr = SUMPOW_E6.map(p => s"${p}L").mkString("array(", ", ", ")")
      val taken = src
        .select(col("source"), col("n_tokens"),
          explode(expr(s"sequence(0, ${EP_MAX - 1})")).as("e"))
        .withColumn("marg",
          expr(s"n_tokens * element_at($powArr, e + 1) div 1000000L"))
        .withColumn("cum", sum(col("n_tokens")).over(
          Window.orderBy(col("marg").desc, col("source"), col("e"))))
        .crossJoin(broadcast(b))
        .filter(col("cum") <= col("b"))
        .groupBy(col("source")).agg(count(lit(1)).as("epochs"))
      val out = src.join(taken, Seq("source"), "left")
        .na.fill(0L, Seq("epochs"))
        .select(col("source"), col("n_tokens"), col("epochs"),
          (col("n_tokens") * col("epochs")).as("alloc_tokens"),
          expr(s"n_tokens * element_at($spArr, CAST(epochs AS INT) + 1)" +
            " div 1000000L").as("eff_tokens"))
      val tot = out.agg(sum(col("alloc_tokens")).as("ta"))
      out.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"), col("epochs"),
          col("alloc_tokens"), col("eff_tokens"),
          expr("alloc_tokens * 1000000L div ta").as("share_e6"))
    },
    Some {
      val powVals = POW_E6.zipWithIndex
        .map { case (p, e) => s"($e, CAST($p AS BIGINT))" }.mkString(", ")
      val spVals = SUMPOW_E6.zipWithIndex
        .map { case (p, k) => s"($k, CAST($p AS BIGINT))" }.mkString(", ")
      s"""WITH src AS (
          SELECT source,
            CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1),
        b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) * 2500000 // 1000000 AS b
              FROM src),
        pow AS (SELECT * FROM (VALUES $powVals) t(e, p)),
        pairs AS (
          SELECT s.source, s.n_tokens, p.e, s.n_tokens * p.p // 1000000 AS marg
          FROM src s, pow p),
        cum AS (
          SELECT *, SUM(n_tokens) OVER (ORDER BY marg DESC, source, e) AS cum
          FROM pairs),
        take AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS epochs
          FROM cum WHERE cum <= (SELECT b FROM b) GROUP BY 1),
        sp AS (SELECT * FROM (VALUES $spVals) t(k, s)),
        outt AS (
          SELECT s.source, s.n_tokens, COALESCE(t.epochs, 0) AS epochs
          FROM src s LEFT JOIN take t USING (source)),
        o2 AS (
          SELECT o.source, o.n_tokens, o.epochs,
            o.n_tokens * o.epochs AS alloc_tokens,
            o.n_tokens * sp.s // 1000000 AS eff_tokens
          FROM outt o JOIN sp ON sp.k = o.epochs)
        SELECT source, n_tokens, epochs, alloc_tokens, eff_tokens,
          alloc_tokens * 1000000 //
            (SELECT CAST(SUM(alloc_tokens) AS BIGINT) FROM o2) AS share_e6
        FROM o2"""
    })

  val all: Seq[QueryDef] =
    Seq(sampleSplit, sampleStratified, mixSources, langRebalance, shardShuffle,
      sampleWeighted, splitLeakageSafe, splitLeakageCert, dsirSelect,
      domainMix, curriculum, repeatAllocation)
}
