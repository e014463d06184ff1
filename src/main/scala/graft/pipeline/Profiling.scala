package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling + frequency sketching — the "know your corpus" stage a
  * pipeline runs before and after every transform: per-column statistics
  * (the ANALYZE TABLE surface a gateway exposes to planners and humans)
  * and a count-min sketch for heavy-hitter frequency estimates whose state
  * is a fixed 4x512 grid regardless of corpus size.
  *
  * Scale notes (100 TB): the profile is ONE scan with map-side partial
  * aggregation (the multi-distinct Expand multiplies rows by n_profiled
  * columns BEFORE partial agg collapses them — the standard ANALYZE cost,
  * linear and shuffle-light); the sketch shuffles only (row, bucket) cells
  * (2048 of them) plus one bounded token aggregate, never text. Neither
  * collects to the driver.
  */
object Profiling {

  /** Per-column table profile of `orders`: row count, null count, exact
    * distinct count, min/max rendered to strings so one relation can carry
    * every column type. Timestamps are formatted explicitly
    * (yyyy-MM-dd HH:mm:ss) — engine-default timestamp casts are not
    * oracle-portable.
    *
    * The profile runs as TWO type-homogeneous aggregates unioned: numeric/
    * timestamp columns in one (min/max buffers are primitive → the whole
    * multi-distinct Expand stays in HashAggregate), string columns in the
    * other (string min/max buffers force SortAggregate — confining them to
    * their own branch keeps the sort off the numeric columns' expanded
    * rows; measured 2.5 s → ~1 s at sf0.1). Two scans ≠ double IO on
    * columnar storage: each branch prunes to ITS columns, so every column
    * is still read exactly once. `stack` reshapes stat rows per column. */
  private val profileTable = QueryDef(
    "q_profile_table",
    (s, d) => {
      val o = Tables.t(s, d, "orders")
      val num = o.agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("nn1"),
        countDistinct(col("o_orderkey")).as("nd1"),
        min(col("o_orderkey")).cast("string").as("mn1"),
        max(col("o_orderkey")).cast("string").as("mx1"),
        count(col("o_custkey")).as("nn2"),
        countDistinct(col("o_custkey")).as("nd2"),
        min(col("o_custkey")).cast("string").as("mn2"),
        max(col("o_custkey")).cast("string").as("mx2"),
        count(col("o_orderdate")).as("nn5"),
        countDistinct(col("o_orderdate")).as("nd5"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mn5"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mx5"))
        .select(expr(
          """stack(3,
               'o_orderkey', n_rows, n_rows - nn1, nd1, mn1, mx1,
               'o_custkey',  n_rows, n_rows - nn2, nd2, mn2, mx2,
               'o_orderdate', n_rows, n_rows - nn5, nd5, mn5, mx5)
             AS (col_name, n_rows, n_null, n_distinct, min_val, max_val)"""))
      val str = o.agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderstatus")).as("nn3"),
        countDistinct(col("o_orderstatus")).as("nd3"),
        min(col("o_orderstatus")).as("mn3"),
        max(col("o_orderstatus")).as("mx3"),
        count(col("o_orderpriority")).as("nn4"),
        countDistinct(col("o_orderpriority")).as("nd4"),
        min(col("o_orderpriority")).as("mn4"),
        max(col("o_orderpriority")).as("mx4"))
        .select(expr(
          """stack(2,
               'o_orderstatus',   n_rows, n_rows - nn3, nd3, mn3, mx3,
               'o_orderpriority', n_rows, n_rows - nn4, nd4, mn4, mx4)
             AS (col_name, n_rows, n_null, n_distinct, min_val, max_val)"""))
      num.unionAll(str)
    },
    Some("""WITH a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(o_orderkey) AS BIGINT) AS nn1,
          CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1,
          CAST(min(o_orderkey) AS VARCHAR) AS mn1,
          CAST(max(o_orderkey) AS VARCHAR) AS mx1,
          CAST(count(o_custkey) AS BIGINT) AS nn2,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2,
          CAST(min(o_custkey) AS VARCHAR) AS mn2,
          CAST(max(o_custkey) AS VARCHAR) AS mx2,
          CAST(count(o_orderstatus) AS BIGINT) AS nn3,
          CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
          min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
          CAST(count(o_orderpriority) AS BIGINT) AS nn4,
          CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd4,
          min(o_orderpriority) AS mn4, max(o_orderpriority) AS mx4,
          CAST(count(o_orderdate) AS BIGINT) AS nn5,
          CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd5,
          strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn5,
          strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx5
        FROM orders)
      SELECT 'o_orderkey' AS col_name, n_rows, n_rows - nn1 AS n_null,
        nd1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM a
      UNION ALL SELECT 'o_custkey', n_rows, n_rows - nn2, nd2, mn2, mx2 FROM a
      UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn3, nd3, mn3, mx3 FROM a
      UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn4, nd4, mn4, mx4 FROM a
      UNION ALL SELECT 'o_orderdate', n_rows, n_rows - nn5, nd5, mn5, mx5 FROM a"""))

  /** Count-min sketch over the corpus token stream: depth 4, width 512 —
    * 2048 int64 cells total, a fixed-size mergeable summary (cells add
    * across shards) that answers "how often does token X appear?" with
    * one-sided error (never under, over only on hash collisions). The
    * query builds the sketch, then audits it: estimate vs exact count for
    * the 20 most frequent tokens.
    *
    * Hashing is the oracle-portable Rabin–Karp polynomial (mod 1e9+7,
    * every intermediate < 4.4e10 — exact int64 on both engines, see
    * q_fingerprint_rolling), with a DIFFERENT base per row (31/37/41/43):
    * each row is its own polynomial, so two tokens colliding in one row
    * are independent in the others (an affine transform of one shared
    * base hash would carry base-hash collisions into every row and make
    * depth useless against them). The sketch is built from the per-token
    * aggregate (identical cell values to hashing raw instances, since
    * cell = Σ cnt over colliding tokens) — at raw-stream scale the same
    * groupBy((r, bucket)) runs directly on instances with map-side
    * partial agg and no token aggregate at all. Probe selection is
    * orderBy+limit (TakeOrderedAndProject — per-partition top-k then one
    * 20-row merge, never a global sort or single-partition window). */
  private def cmsAudit(s: SparkSession, d: String): DataFrame = {
      val toks = Tables.t(s, d, "documents")
        .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
      val cnts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val keyed = cnts
        .select(col("tok"), col("cnt"), explode(expr("sequence(0, 3)")).as("r"))
        .withColumn("bucket", expr(
          """aggregate(filter(split(tok, ''), c -> c != ''),
             0L, (acc, c) -> (acc * element_at(array(31L, 37L, 41L, 43L),
               CAST(r + 1 AS INT)) + ascii(c)) % 1000000007) % 512"""))
      val cells = keyed.groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("cell"))
      val probes = cnts.orderBy(col("cnt").desc, col("tok")).limit(20)
      keyed.drop("cnt")
        .join(broadcast(probes), "tok")
        .join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("tok"), col("cnt"))
        .agg(min(col("cell")).as("est_cnt"))
        .select(col("tok"), col("cnt").as("exact_cnt"), col("est_cnt"))
  }

  private val sketchCms = QueryDef(
    "q_sketch_cms",
    (s, d) => cmsAudit(s, d),
    Some("""WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        FROM documents),
      cnts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
      keyed AS (
        SELECT tok, cnt, r,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(unicode(c) AS BIGINT) for c in string_split(tok, '')]),
            (a, b) -> (a * ([31,37,41,43][r+1]) + b) % 1000000007) % 512
            AS bucket
        FROM (SELECT tok, cnt, unnest([0,1,2,3]) AS r FROM cnts)),
      cells AS (
        SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS cell
        FROM keyed GROUP BY 1, 2),
      probes AS (SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok LIMIT 20)
      SELECT p.tok AS tok, p.cnt AS exact_cnt, CAST(min(c.cell) AS BIGINT) AS est_cnt
      FROM probes p
      JOIN keyed k ON p.tok = k.tok
      JOIN cells c ON k.r = c.r AND k.bucket = c.bucket
      GROUP BY 1, 2"""))

  /** The CMS's error CONTRACT, gated (the q_profile_quantiles /
    * q_hopping_window_approx certification pattern applied to the third
    * sketch family): per probed key, (a) the estimate never undercounts
    * (structural — every cell the key hashes into holds at least its own
    * count) and (b) the overcount stays within the textbook ε·N bound for
    * ε = e/width at confidence 1 − e^(−depth): est ≤ exact + (e/512)·N,
    * N = total token instances. q_sketch_cms already hash-gates the exact
    * sketch VALUES (the Rabin–Karp hashing is oracle-portable); this
    * entry gates the GUARANTEE a user sizes the sketch by — a width or
    * merge regression that kept values self-consistent but broke the
    * bound fails here. The oracle recomputes the probe set and emits the
    * contract as literal TRUE per key, so any FALSE hash-mismatches at
    * the driver. Deterministic: the bound has ~150–1400 counts of
    * headroom on the gate corpora (measured overcount: 0 — the top-20
    * tokens share no saturated cell), far beyond what a testdata regen
    * moves. */
  private val sketchCmsCert = QueryDef(
    "q_sketch_cms_cert",
    (s, d) => {
      val audited = cmsAudit(s, d)
      // N must be the FULL stream length, not the probe subtotal.
      val total = Tables.t(s, d, "documents")
        .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
        .agg(count(lit(1)).cast("double").as("n_total"))
      audited.crossJoin(broadcast(total))
        .select(col("tok"),
          (col("est_cnt") >= col("exact_cnt")).as("never_under"),
          (col("est_cnt").cast("double") <=
            col("exact_cnt").cast("double") +
              lit(math.E / 512.0) * col("n_total")).as("within_eps"))
    },
    Some("""WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        FROM documents),
      cnts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1)
      SELECT tok, TRUE AS never_under, TRUE AS within_eps
      FROM (SELECT tok FROM cnts ORDER BY cnt DESC, tok LIMIT 20)"""))

  /** Approximate quantiles with a GATED error contract — the
    * q_hopping_window_approx certification pattern applied to the second
    * sketch family a profiling stage runs at 100 TB: `approx_percentile`
    * (Greenwald-Khanna, fixed-size mergeable state, one pass) instead of
    * exact `percentile` (sort-buffer per group). Sketch values are
    * implementation-specific, so the gated output is the CONTRACT: per
    * (column, quantile), a boolean that the approx value's RANK interval
    * intersects the sketch's guarantee window — Spark co-computes the
    * exact rank interval of the approx value (two one-pass aggregates
    * joined at metadata grain) and checks
    * [count(<v), count(<=v)] ∩ [qN − εN − 1, qN + εN + 1] ≠ ∅ for
    * ε = 1/accuracy; the oracle emits the same (column, quantile) grid
    * with TRUE. Rank (not value) error is what GK guarantees — a
    * value-error bound would be vacuous on skewed columns — and the
    * INTERVAL form is the correct statement under ties (l_quantity has
    * 50 discrete values, so a returned value occupies a ~2%-of-N-wide
    * rank range and any point-rank check fails regardless of sketch
    * quality; measured before this form landed). */
  private val QUANTS = Seq(0.5, 0.9, 0.99)
  private val GK_ACC = 1000
  private val profileQuantiles = QueryDef(
    "q_profile_quantiles",
    (s, d) => {
      val li = Tables.t(s, d, "lineitem")
      val cols = Seq("l_extendedprice", "l_quantity")
      val qarr = array(QUANTS.map(lit): _*)
      // One pass: every column's sketch in one aggregate row.
      val approxRow = li.agg(
        count(lit(1)).as("n"),
        approx_percentile(col(cols.head).cast("double"), qarr, lit(GK_ACC))
          .as(s"ap_${cols.head}"),
        approx_percentile(col(cols(1)).cast("double"), qarr, lit(GK_ACC))
          .as(s"ap_${cols(1)}"))
      // (column, q, approx value) rows, metadata-sized.
      val est = cols.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (acc, c) =>
          val one = approxRow.select(lit(c).as("colname"), col("n"),
            posexplode(col(s"ap_$c"))).toDF("colname", "n", "qi", "est")
          Some(acc.fold(one)(_.unionByName(one)))
      }.get
      // Exact rank INTERVAL of each approx value: one more pass counting
      // values < est and <= est per (column, quantile) — a broadcast of
      // the tiny est table against the fact scan, aggregated map-side.
      // With TIES (l_quantity is 50 discrete values) the returned value
      // occupies the whole rank interval (count(<v), count(<=v)]; GK
      // guarantees SOME occupied position lies within eps*N of q*N, so
      // the contract is interval INTERSECTION, not a point check — a
      // point rank/N would fail on any coarse column no matter how good
      // the sketch is.
      val ranks = cols.map { c =>
        li.select(col(c).cast("double").as("v")).crossJoin(
          broadcast(est.filter(col("colname") === c)
            .select(col("qi"), col("est"))))
          .groupBy(col("qi"))
          .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("rank_lt"),
            sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rank_le"))
          .withColumn("colname", lit(c))
      }.reduce(_.unionByName(_))
      est.join(ranks, Seq("colname", "qi"))
        .select(col("colname"),
          floor(element_at(typedLit(QUANTS), col("qi") + 1) * 100).cast("long")
            .as("q_pct"),
          {
            val target = element_at(typedLit(QUANTS), col("qi") + 1) *
              col("n").cast("double")
            val eps = lit(1.0 / GK_ACC) * col("n").cast("double") + 1.0
            (col("rank_le").cast("double") >= target - eps &&
              col("rank_lt").cast("double") <= target + eps).as("within_bound")
          })
    },
    Some("""SELECT c.colname, q.q_pct, TRUE AS within_bound
      FROM (VALUES ('l_extendedprice'), ('l_quantity')) c(colname),
           (VALUES (CAST(50 AS BIGINT)), (90), (99)) q(q_pct)"""))

  /** Classifier-calibration metric: the exact tie-adjusted ROC-AUC of the
    * CHEAP linear quality score (q_quality_classifier) predicting the
    * EXPENSIVE Gopher repetition-gate outcome (q_quality_gopher's keep) —
    * the standard "can the cheap score pre-filter for the costly gate"
    * question a pipeline answers before reordering its filter cascade.
    * Both inputs are reused from the REGISTERED QueryDefs (build + oracle
    * embedded verbatim), so this gate can never drift from the gated
    * definitions of its own inputs.
    *
    * Exact AUC with ties (Mann-Whitney): over distinct score values s with
    * (pos_s, neg_s) counts, AUC·P·N = Σ_s neg_below(s)·pos_s + pos_s·neg_s/2.
    * Everything is kept in integers (×2 to absorb the half), so the result
    * is an exact rational rendered at e6.
    *
    * Scale shape: inputs are map-only scans; the join keys on doc_id; the
    * score-grain aggregate collapses to distinct scores with map-side
    * partials. The cumulative runs TWO-PHASE — a per-bucket subtotal
    * (score div 10⁴ → a few hundred buckets at any corpus size, one
    * driver-scale ordered window) plus an in-bucket ordered window
    * PARTITIONED by bucket — the repo's bucketed-window discipline, so no
    * corpus-cardinality relation ever passes through a single-partition
    * sort even if every document carried a distinct score. */
  /** The (doc_id, score_e6, lab) relation both calibration gates consume —
    * a content-keyed persisted store (the materializedPairs discipline):
    * q_quality_auc and q_calibration_ece each re-ran the EXPENSIVE Gopher
    * repetition gate (the interpreted-HOF CPU family, the suite's worst
    * decade law) plus the cheap classifier per query. One build per corpus
    * per JVM; both builders come from the REGISTERED QueryDefs, so the
    * store can never drift from the gated definitions of its inputs. */
  private val scoreLabelCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  Tables.registerTempCacheCleanup(scoreLabelCache)

  private def scoreLabelStore(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.contentKeyedTempParquet(scoreLabelCache, s,
      s"$d/documents.parquet", "graft-scorelab-store") {
      def defOf(mod: Seq[QueryDef], n: String) = mod.find(_.name == n).get
      defOf(Curation.all, "q_quality_classifier").build(s, d)
        .select(col("doc_id"), col("score_e6"))
        .join(defOf(TextAnalysis.all, "q_quality_gopher").build(s, d)
          .select(col("doc_id"),
            when(col("keep"), 1L).otherwise(0L).as("lab")), Seq("doc_id"))
    }

  private val AUC_BKT = 10000L
  private val qualityAuc = QueryDef(
    "q_quality_auc",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val j = scoreLabelStore(s, d)
      val g = j.groupBy(col("score_e6"))
        .agg(sum(col("lab")).as("pos"), sum(lit(1L) - col("lab")).as("neg"))
        .withColumn("bkt", expr(s"score_e6 div $AUC_BKT"))
      val bktBelow = g.groupBy(col("bkt")).agg(sum(col("neg")).as("bneg"))
        .withColumn("below_bkt", coalesce(sum(col("bneg")).over(
          Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("bkt"), col("below_bkt"))
      val c = g.join(bktBelow, Seq("bkt"))
        .withColumn("below_in", coalesce(sum(col("neg")).over(
          Window.partitionBy(col("bkt")).orderBy(col("score_e6"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("neg_below", col("below_bkt") + col("below_in"))
      c.agg(
        sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(lit(2L) * col("neg_below") * col("pos") + col("pos") * col("neg"))
          .as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            expr("(u2 * CAST(1000000 AS BIGINT)) div (2 * n_pos * n_neg)"))
            .as("auc_e6"))
    },
    Some {
      def defOf(mod: Seq[QueryDef], n: String) = mod.find(_.name == n).get
      val clsSql = defOf(Curation.all, "q_quality_classifier").oracle.get
      val gopSql = defOf(TextAnalysis.all, "q_quality_gopher").oracle.get
      s"""WITH cls AS ($clsSql),
        gop AS ($gopSql),
        j AS (
          SELECT c.doc_id, c.score_e6,
            CASE WHEN g.keep THEN CAST(1 AS BIGINT) ELSE 0 END AS lab
          FROM cls c JOIN gop g USING (doc_id)),
        g2 AS (
          SELECT score_e6, CAST(SUM(lab) AS BIGINT) AS pos,
            CAST(COUNT(*) - SUM(lab) AS BIGINT) AS neg
          FROM j GROUP BY 1),
        c2 AS (
          SELECT pos, neg,
            CAST(COALESCE(SUM(neg) OVER (ORDER BY score_e6
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS neg_below
          FROM g2),
        t AS (
          SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
            CAST(SUM(neg) AS BIGINT) AS n_neg,
            CAST(SUM(2 * neg_below * pos + pos * neg) AS BIGINT) AS u2
          FROM c2)
        SELECT n_pos, n_neg, u2,
          CASE WHEN n_pos > 0 AND n_neg > 0
            THEN (u2 * 1000000) // (2 * n_pos * n_neg) END AS auc_e6
        FROM t"""
    })

  /** Calibration reliability table + ECE (Guo et al. 2017 / Naeini et al.
    * 2015) for the same (cheap score → expensive Gopher gate) pairing
    * [[qualityAuc]] ranks: AUC says the score ORDERS the gate well; this
    * says whether its normalized magnitude can be TRUSTED as a
    * probability — the question a pipeline asks before replacing the
    * costly gate with a score threshold at some target precision.
    * Min-max-normalized score → 10 equal-width bins; per bin the mean
    * normalized score (confidence), empirical positive rate (accuracy),
    * and |gap|; ECE = Σ n_b·gap_b / N. Every value is exact int64 —
    * nonnegative operands throughout, so Spark `div` and DuckDB `//`
    * agree (the possibly-negative raw score is shifted by the global min
    * BEFORE any division).
    *
    * Scale shape: inputs are the registered map-only builders (reused
    * verbatim, the AUC discipline); the narrow (doc_id, score, label)
    * relation is checkpointed once for its two consumers (the ccnet
    * lesson); min/max and the ECE total are 1-row broadcast crosses; the
    * only exchange is the 10-row bin aggregate with map-side partials. */
  private val calibrationEce = QueryDef(
    "q_calibration_ece",
    (s, d) => {
      val j = scoreLabelStore(s, d).localCheckpoint()
      val mm = j.agg(min(col("score_e6")).as("mn"),
        greatest(max(col("score_e6")) - min(col("score_e6")), lit(1L)).as("rng"))
      val bins = j.crossJoin(broadcast(mm))
        .withColumn("p_e6", expr("((score_e6 - mn) * 1000000) div rng"))
        .withColumn("bin", least(lit(9L), expr("p_e6 div 100000")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("p_e6")).as("psum"),
          sum(col("lab")).as("n_pos"))
        .withColumn("conf_e6", expr("psum div n"))
        .withColumn("acc_e6", expr("(n_pos * 1000000) div n"))
        .withColumn("gap_e6", abs(col("conf_e6") - col("acc_e6")))
      val ece = bins.agg(
        expr("sum(n * gap_e6) div sum(n)").as("ece_e6"))
      bins.crossJoin(broadcast(ece))
        .select(col("bin"), col("n"), col("conf_e6"), col("acc_e6"),
          col("gap_e6"), col("ece_e6"))
    },
    Some {
      def defOf(mod: Seq[QueryDef], n: String) = mod.find(_.name == n).get
      val clsSql = defOf(Curation.all, "q_quality_classifier").oracle.get
      val gopSql = defOf(TextAnalysis.all, "q_quality_gopher").oracle.get
      s"""WITH cls AS ($clsSql),
        gop AS ($gopSql),
        j AS MATERIALIZED (
          SELECT c.doc_id, c.score_e6,
            CASE WHEN g.keep THEN CAST(1 AS BIGINT) ELSE 0 END AS lab
          FROM cls c JOIN gop g USING (doc_id)),
        mm AS (SELECT MIN(score_e6) AS mn,
                 GREATEST(MAX(score_e6) - MIN(score_e6), 1) AS rng FROM j),
        p AS (
          SELECT LEAST(9, (((score_e6 - mn) * 1000000) // rng) // 100000) AS bin,
            ((score_e6 - mn) * 1000000) // rng AS p_e6, lab
          FROM j, mm),
        bins AS (
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(p_e6) AS BIGINT) // COUNT(*) AS conf_e6,
            (CAST(SUM(lab) AS BIGINT) * 1000000) // COUNT(*) AS acc_e6
          FROM p GROUP BY 1),
        g2 AS (SELECT bin, n, conf_e6, acc_e6,
                 ABS(conf_e6 - acc_e6) AS gap_e6 FROM bins),
        e2 AS (SELECT CAST(SUM(n * gap_e6) AS BIGINT) // CAST(SUM(n) AS BIGINT)
                 AS ece_e6 FROM g2)
        SELECT bin, n, conf_e6, acc_e6, gap_e6, e2.ece_e6 FROM g2, e2"""
    })

  val all: Seq[QueryDef] =
    Seq(profileTable, sketchCms, sketchCmsCert, profileQuantiles, qualityAuc,
      calibrationEce)
}
