package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Nearest-centroid classification (Rocchio): assign every vector to the
    * label whose mean embedding is closest in L2, and report the confusion
    * matrix — the label-propagation / auto-labeling pass of an embedding
    * pipeline, and a purity audit of the label column itself.
    *
    * All math is exact fixed-point int64 so the DuckDB gate compares
    * bit-for-bit across engines (float means would be summation-order
    * dependent): components quantize to qi = floor(v*1000) CLAMPED to
    * [-1e6, 1e6] — the |v| <= 1000 precondition is enforced, not assumed,
    * so an out-of-contract embedding degrades gracefully instead of
    * diverging (int64 wrap on one engine, error on the other). The
    * centroid mean is floor(sum/cnt) at the same e3 scale, computed via a
    * positive shift (+1e6 per element) so floor-vs-truncate division
    * semantics can't diverge; distances are exact sums of squared int64
    * e3-scale diffs: |diff| <= 2e6, so the sum stays exact up to ~2e6
    * dimensions — overflow-safe for any real embedding width.
    *
    * Scale shape: centroids are (labels × dims) rows — tiny forever — so
    * they broadcast; the expand factor on the fact side is n_labels with
    * map-side partial aggregation collapsing it immediately; the argmin
    * window partitions on vec_id (perfectly distributed). No shuffle ever
    * carries an embedding. */
  private val centroidClassify = QueryDef(
    "q_centroid_classify",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dims = Tables.t(s, d, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("dim"),
          greatest(lit(-1000000L), least(lit(1000000L),
            floor(col("col").cast("double") * 1000).cast("long"))).as("qi"))
      val cent = dims.groupBy(col("label"), col("dim"))
        .agg(sum(col("qi")).as("s"), count(lit(1)).as("cnt"))
        .select(col("label").as("cand_label"), col("dim"),
          expr("(s + cnt * 1000000L) div cnt - 1000000L").as("mean_e3"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist"), col("cand_label"))
      dims.join(broadcast(cent), "dim")
        .withColumn("diff", col("qi") - col("mean_e3"))
        .groupBy(col("vec_id"), col("label"), col("cand_label"))
        .agg(sum(col("diff") * col("diff")).as("dist"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("label"), col("cand_label").as("pred_label"))
        .agg(count(lit(1)).as("n_vecs"))
    },
    Some("""WITH dims AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS dim,
          greatest(-1000000, least(1000000,
            CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT))) AS qi
        FROM embeddings),
      cent AS (
        SELECT label AS cand_label, dim,
          CAST((sum(qi) + count(*) * 1000000) // count(*)
            - 1000000 AS BIGINT) AS mean_e3
        FROM dims GROUP BY 1, 2),
      scored AS (
        SELECT d.vec_id, d.label, c.cand_label,
          sum((d.qi - c.mean_e3) * (d.qi - c.mean_e3)) AS dist
        FROM dims d JOIN cent c USING (dim)
        GROUP BY 1, 2, 3),
      ranked AS (
        SELECT vec_id, label, cand_label,
          ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY dist, cand_label) AS rk
        FROM scored)
      SELECT label, cand_label AS pred_label,
        CAST(count(*) AS BIGINT) AS n_vecs
      FROM ranked WHERE rk = 1 GROUP BY 1, 2"""))

  /** Johnson–Lindenstrauss projection dims and quantization scale. A ±1
    * (Rademacher) matrix R of shape K×D gives E‖Rx‖² = K·‖x‖², so the
    * per-pair distortion statistic ‖R(u−v)‖²·1e6 / (K·‖u−v‖²)
    * concentrates at 1e6 — the 4:1 dimensionality reduction every
    * 100 TB embedding pipeline wants BEFORE paying for ANN indexing or
    * pairwise scoring. Components quantize at 1e3 (|q| ≤ ~530 on this
    * corpus), keeping every product chain within int64 by construction:
    * d2p·1e6 ≤ 16·(2·64·530)²·1e6 ≈ 7e16. */
  private val JL_K = 16
  private val JL_D = 64
  private val JL_NQ = 10

  /** Seeded Rademacher rows — deterministic across runs and engines; the
    * matrix ships as a literal on both sides (the LSH-hyperplane
    * discipline). */
  private[graft] def jlMatrix: Seq[Seq[Long]] = {
    val rng = new scala.util.Random(1337)
    Seq.fill(JL_K, JL_D)(if (rng.nextBoolean()) 1L else -1L)
  }

  /** JL random-projection certification: project the quantized corpus
    * 64→16 dims with the seeded ±1 matrix and report, per query vector,
    * the min/max/mean pairwise-distance distortion against every other
    * vector. Everything after quantization is EXACT integer arithmetic —
    * a dot product of int64s is summation-order independent, so both
    * engines agree bit-for-bit with no IEEE ordering discipline needed
    * (the reason a JL certificate can be exact where a float one can't).
    *
    * Scale shape: projection is a pure per-row map against the broadcast
    * literal matrix (the shape that projects 100 TB map-side before
    * indexing); only the NQ-row query side replicates; per-qid min/max/
    * sum partial-aggregate map-side, so the only exchange carries NQ
    * rows. Nothing is all-pairs on the corpus side. */
  private val jlProject = QueryDef(
    "q_jl_project",
    (s, d) => {
      val m = typedLit(jlMatrix)
      val p = Tables.t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
        .withColumn("pv", transform(m, r =>
          aggregate(zip_with(col("qv"), r, (x, c) => x * c),
            lit(0L), (a, x) => a + x)))
      val q = broadcast(p.filter(col("vec_id") < JL_NQ)
        .select(col("vec_id").as("qid"), col("qv").as("qqv"),
          col("pv").as("qpv")))
      def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x)
      q.join(p, col("vec_id") =!= col("qid"))
        .select(col("qid"), sq(col("qqv"), col("qv")).as("d2o"),
          sq(col("qpv"), col("pv")).as("d2p"))
        .filter(col("d2o") > 0L)
        .select(col("qid"),
          expr(s"d2p * CAST(1000000 AS BIGINT) div ($JL_K * d2o)").as("ratio_e6"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("ratio_e6")).as("min_ratio_e6"),
          max(col("ratio_e6")).as("max_ratio_e6"),
          expr("sum(ratio_e6) div count(1)").as("avg_ratio_e6"))
    },
    Some {
      val rows = jlMatrix.map(_.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""WITH r AS (SELECT CAST($rows AS BIGINT[][]) AS m),
        e AS (
          SELECT vec_id,
            list_transform(CAST(embedding AS DOUBLE[]),
              x -> CAST(FLOOR(x * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        p AS (
          SELECT vec_id, qv,
            list_transform(m, row -> CAST(list_sum(
              list_transform(range(1, ${JL_D + 1}),
                i -> qv[i] * row[i])) AS BIGINT)) AS pv
          FROM e, r),
        q AS (
          SELECT vec_id AS qid, qv AS qqv, pv AS qpv
          FROM p WHERE vec_id < $JL_NQ),
        pr AS (
          SELECT qid,
            CAST(list_sum(list_transform(range(1, ${JL_D + 1}),
              i -> (qqv[i] - qv[i]) * (qqv[i] - qv[i]))) AS BIGINT) AS d2o,
            CAST(list_sum(list_transform(range(1, ${JL_K + 1}),
              i -> (qpv[i] - pv[i]) * (qpv[i] - pv[i]))) AS BIGINT) AS d2p
          FROM q, p WHERE vec_id <> qid),
        x AS (
          SELECT qid, d2p * 1000000 // ($JL_K * d2o) AS ratio_e6
          FROM pr WHERE d2o > 0)
        SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          MIN(ratio_e6) AS min_ratio_e6, MAX(ratio_e6) AS max_ratio_e6,
          CAST(SUM(ratio_e6) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
            AS avg_ratio_e6
        FROM x GROUP BY 1"""
    })

  /** Top principal component by power iteration WITHOUT materializing the
    * Gram matrix — the classic distributed-PCA formulation: each round
    * computes y = Xᵀ(Xv) as two map-side passes over the row-partitioned
    * matrix (a per-row dot against the broadcast 64-long vector, then a
    * dim-keyed weighted column sum), never the d×d covariance and never a
    * row-keyed shuffle. Per round exactly 65 values leave the executors:
    * the normalization max (1 row) and the new direction (64 rows) — the
    * BPE/centroid driver-pull precedent (the pulled vector shapes the next
    * round's plan as a literal). The FINAL round's normalization stays
    * in-plan (broadcast 1-row agg), so the published axis is
    * engine-computed end to end.
    *
    * Determinism: the float recurrence is replaced by a pinned integer
    * one. Components quantize at e4; each round w = Σ xqᵀv, wp = w
    * sign-magnitude-divided by (max|w| div 1e5), y = Σ xq·wp, v' = y
    * sign-magnitude-divided by (max|y| div 1e6). Sign-magnitude division
    * (−((−a) div b) for a<0) is pinned explicitly because Spark `div`
    * truncates while DuckDB `//` floors — they agree only on nonnegative
    * operands. Bounds: |xq|≤1e4·|x|, |v|≤2e6, |wp|≤2e5 ⇒ |w|≤64·1e4·2e6
    * ≈ 1.3e12 and |y|≤N·1e4·2e5 = N·2e9 — int64-safe to N ≈ 4·10⁹ rows;
    * past that (a full 100 TB embedding store) the y-accumulation runs
    * the same recurrence per shard with one extra combine level, same
    * plan shape. Power iteration's sign ambiguity (±v) does not exist
    * here: both engines run the identical deterministic sequence.
    *
    * Rounds are a plan constant (8, the [[graft.pipeline.GraphOps]]
    * discipline): the output is DEFINED as the round-8 direction whether
    * or not the iteration converged (the k-core precedent). On real
    * embedding corpora the top component carries a large spectral gap and
    * 8 rounds converge; the synthetic gate corpus is near-isotropic
    * (λ₁/λ₂ ≈ 1.017), so the spec certifies what IS round-invariant:
    * bit-equality to the pinned recompute, ≤e-3 drift from the float
    * iteration at the same round count, and a non-decreasing Rayleigh
    * quotient. */
  private val PCA_Q = 10000L
  private val PCA_WSCALE = 100000L
  private val PCA_VSCALE = 1000000L
  private val PCA_ROUNDS = 8

  /** The e4-quantized row matrix, checkpointed once per query. */
  private def pcaX(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.t(s, d, "embeddings")
      .filter(!exists(col("embedding"), x => isnan(x)))
      .select(col("vec_id"), expr(
        s"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $PCA_Q) AS BIGINT))")
        .as("xq"))
      .localCheckpoint()

  /** One y = Xᵀ(Xv) pass against a literal direction (two map stages +
    * a 64-row dim aggregate; the wp normalization max is the one driver
    * pull inside). Both in-plan-broadcast and driver-pull shapes run TWO
    * jobs per round with the dot computed twice (a broadcast exchange is
    * its own job under AQE) — measured r12: the broadcast form is ~30%
    * SLOWER (q_pca_power 1.58 vs 1.17 s quiet sf0.1; per-round adaptive
    * broadcast-stage scheduling costs more than a 1-row collect), so the
    * collect stays. The `getOrElse(1)` guards the empty/all-NaN matrix
    * (max over zero rows is NULL), mirroring [[pcaRound]]'s guard. */
  private def pcaYOf(X: DataFrame, vec: Array[Long]): DataFrame = {
    val dotLit = expr(
      s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          (acc, i) -> acc + element_at(xq, i + 1) *
            element_at(array(${vec.mkString(",")}), i + 1))""")
    val w = X.withColumn("w", dotLit)
    val wm = math.max(Option(w.agg(max(abs(col("w")))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L), 1L)
    val ws = math.max(wm / PCA_WSCALE, 1L)
    w.withColumn("wp",
        expr(s"CASE WHEN w < 0 THEN -((-w) div $ws) ELSE w div $ws END"))
      .select(col("wp"), posexplode(col("xq")).as(Seq("dim", "xv")))
      .groupBy(col("dim")).agg(sum(col("xv") * col("wp")).as("y"))
  }

  private def idivL(a: Long, b: Long): Long = if (a < 0) -((-a) / b) else a / b

  /** Driver-side round: pull y (the round's ONE driver round-trip),
    * normalize under the pinned rule. An empty/all-NaN matrix yields zero
    * y rows → ym defaults to 1 and the direction degenerates to the zero
    * vector (mirroring the NULL-skipping greatest in [[pcaYOf]]) instead
    * of crashing plan-build (ADVICE r11). */
  private def pcaRound(X: DataFrame, v: Array[Long]): Array[Long] = {
    val yRows = pcaYOf(X, v).collect().map(r => r.getInt(0) -> r.getLong(1))
    val ym = math.max(yRows.foldLeft(0L)((m, p) => math.max(m, math.abs(p._2))), 1L)
    val ys = math.max(ym / PCA_VSCALE, 1L)
    val nv = Array.fill(64)(0L)
    yRows.foreach { case (j, y) => nv(j) = idivL(y, ys) }
    nv
  }

  /** Pinned deflation against a fixed direction: v − round(⟨v,u⟩/⟨u,u⟩)·u
    * in e6 fixed point, every division sign-magnitude. Bound: the
    * projection coefficient of a normalized v on a normalized u is ≤ 16
    * (√(64·(2e6)²)/√(1e6²)), so |deflated| ≤ 3.4e7 and the w-pass bound
    * 64·1e4·3.4e7·1e5 ≈ 2.2e18 stays int64-safe. */
  private def pcaDeflate(v: Array[Long], u: Array[Long]): Array[Long] = {
    val n1 = u.map(x => x * x).sum
    val sp = (0 until 64).map(j => v(j) * u(j)).sum
    val c = idivL(sp, math.max(n1 / PCA_VSCALE, 1L))
    (0 until 64).map(j => v(j) - idivL(c * u(j), PCA_VSCALE)).toArray
  }

  /** The pinned chains' FULL round sequences — chain 1 c1(0) = v0 ..
    * c1(8) = the top direction; chain 2 c2(0) = deflate(v0, v1) .. c2(8)
    * = the second direction — once per corpus content per JVM (the
    * bpeLearn store discipline, r12). Every PCA consumer replays a
    * PREFIX of exactly these sequences (q_pca_power uses c1(ROUNDS−1)
    * before its in-plan final round; q_pca_deflate uses c1(ROUNDS) and
    * c2(ROUNDS−1); q_pca_variance uses both finals), so serving them
    * from the cache cannot change any gated value — it only stops the
    * three queries from re-running up to 16 y-passes each.
    *
    * The chains cache INDEPENDENTLY (ADVICE r12): a cold standalone
    * q_pca_power demands only chain 1 and pays only its ROUNDS passes;
    * chain 2 extends the cache on first demand (q_pca_deflate/variance),
    * reading the cached chain 1 for its deflation direction. The `#c1` /
    * `#c2` token suffixes are builder-param suffixes to
    * [[Tables.staleSibling]]: same-content entries never evict each
    * other, a regen evicts both. */
  private val pcaChainCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[IndexedSeq[Array[Long]]]]()

  private def pcaChain1(s: org.apache.spark.sql.SparkSession, d: String)
      : IndexedSeq[Array[Long]] = {
    val token = Tables.contentToken(s"$d/embeddings.parquet") + "#c1"
    Tables.keyedOnce(pcaChainCache, token)(Tables.staleSibling(token, _)) {
      val X = pcaX(s, d)
      val c1 = scala.collection.mutable.ArrayBuffer(Array.fill(64)(PCA_VSCALE))
      for (_ <- 1 to PCA_ROUNDS) c1 += pcaRound(X, c1.last)
      c1.toIndexedSeq
    }
  }

  private def pcaChain2(s: org.apache.spark.sql.SparkSession, d: String)
      : IndexedSeq[Array[Long]] = {
    val token = Tables.contentToken(s"$d/embeddings.parquet") + "#c2"
    Tables.keyedOnce(pcaChainCache, token)(Tables.staleSibling(token, _)) {
      val v1 = pcaChain1(s, d).last
      val X = pcaX(s, d)
      val c2 = scala.collection.mutable.ArrayBuffer(
        pcaDeflate(Array.fill(64)(PCA_VSCALE), v1))
      for (_ <- 1 to PCA_ROUNDS) c2 += pcaDeflate(pcaRound(X, c2.last), v1)
      c2.toIndexedSeq
    }
  }


  /** The unrolled SQL rounds with a CTE-name prefix and a per-round
    * source-relation function (chain 2 reads the DEFLATED previous
    * round). Prefix "" with src k ⇒ v{k-1} reproduces q_pca_power's
    * oracle text exactly. */
  private def pcaRoundsSql(p: String, src: Int => String): String =
    (1 to PCA_ROUNDS).map { k =>
      s"""${p}w$k AS MATERIALIZED (
        SELECT x.vec_id, CAST(SUM(x.xv * v.v) AS BIGINT) AS w
        FROM xl x JOIN ${src(k)} v USING (dim) GROUP BY 1),
      ${p}ws$k AS (SELECT GREATEST(GREATEST(MAX(ABS(w)), 1) // $PCA_WSCALE, 1)
                 AS ws FROM ${p}w$k),
      ${p}wp$k AS MATERIALIZED (
        SELECT w.vec_id,
          CASE WHEN w.w < 0 THEN -((-w.w) // s.ws) ELSE w.w // s.ws END AS wp
        FROM ${p}w$k w, ${p}ws$k s),
      ${p}y$k AS MATERIALIZED (
        SELECT x.dim, CAST(SUM(x.xv * p.wp) AS BIGINT) AS y
        FROM xl x JOIN ${p}wp$k p USING (vec_id) GROUP BY 1),
      ${p}ys$k AS (SELECT GREATEST(GREATEST(MAX(ABS(y)), 1) // $PCA_VSCALE, 1)
                 AS ys FROM ${p}y$k),
      ${p}v$k AS MATERIALIZED (
        SELECT dim,
          CASE WHEN y < 0 THEN -((-y) // s.ys) ELSE y // s.ys END AS v
        FROM ${p}y$k, ${p}ys$k s)"""
    }.mkString(",\n")

  private def pcaBaseSql: String =
    s"""x AS MATERIALIZED (
        SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
          e -> CAST(FLOOR(e * $PCA_Q) AS BIGINT)) AS xq
        FROM embeddings
        WHERE len(list_filter(embedding, e -> isnan(e))) = 0),
      xl AS MATERIALIZED (
        SELECT vec_id, CAST(generate_subscripts(xq, 1) - 1 AS BIGINT) AS dim,
          unnest(xq) AS xv
        FROM x)"""

  private val pcaPower = QueryDef(
    "q_pca_power",
    (s, d) => {
      val X = pcaX(s, d)
      val v = pcaChain1(s, d)(PCA_ROUNDS - 1)
      val yFinal = pcaYOf(X, v).localCheckpoint()
      val ym = yFinal.agg(greatest(max(abs(col("y"))), lit(1L)).as("ym"))
      yFinal.crossJoin(broadcast(ym))
        .withColumn("ys", greatest(expr(s"ym div $PCA_VSCALE"), lit(1L)))
        .select(col("dim").cast("long").as("dim"),
          expr("CASE WHEN y < 0 THEN -((-y) div ys) ELSE y div ys END").as("v_e6"))
    },
    Some(s"""WITH $pcaBaseSql,
        v0 AS (SELECT CAST(r.range AS BIGINT) AS dim,
                 CAST($PCA_VSCALE AS BIGINT) AS v FROM range(0, 64) r),
        ${pcaRoundsSql("", k => s"v${k - 1}")}
        SELECT dim, v AS v_e6 FROM v$PCA_ROUNDS"""))

  /** Second principal component by deflation (Hotelling 1933's iterated
    * form): rerun the power iteration while projecting out the learned
    * top direction after EVERY normalization — v ← deflate(normalize(
    * Xᵀ(Xv))) — so the walk converges toward the second invariant
    * subspace instead of collapsing back onto the first. All arithmetic
    * stays in the pinned integer recurrence; the deflation adds one
    * sign-magnitude projection per round ([[pcaDeflate]]). Output:
    * (dim, v1_e6, v2_e6) — chain 1 rides the gated q_pca_power
    * recurrence verbatim (shared helpers, shared SQL builder), chain 2's
    * FINAL normalize+deflate run in-plan (broadcast 1-row aggs + the
    * 64-row literal v1 relation), the q_pca_power discipline.
    *
    * Scale shape: 2× q_pca_power — 32 map passes over the one
    * checkpointed matrix, 65 pulled values per round, no row-keyed
    * shuffle ever; the deflation itself is 64-row metadata arithmetic. */
  private val pcaDeflateQ = QueryDef(
    "q_pca_deflate",
    (s, d) => {
      val X = pcaX(s, d)
      val v1 = pcaChain1(s, d)(PCA_ROUNDS)
      val v = pcaChain2(s, d)(PCA_ROUNDS - 1)
      // Final round in-plan: normalize, then deflate against the literal
      // v1 relation.
      val n1 = v1.map(x => x * x).sum
      val ns = math.max(n1 / PCA_VSCALE, 1L)
      import s.implicits._
      val v1df = v1.zipWithIndex.map { case (x, j) => (j.toLong, x) }.toSeq
        .toDF("dim", "v1_e6")
      val yFinal = pcaYOf(X, v).localCheckpoint()
      val ym = yFinal.agg(greatest(max(abs(col("y"))), lit(1L)).as("ym"))
      val v8 = yFinal.crossJoin(broadcast(ym))
        .withColumn("ys", greatest(expr(s"ym div $PCA_VSCALE"), lit(1L)))
        .select(col("dim").cast("long").as("dim"),
          expr("CASE WHEN y < 0 THEN -((-y) div ys) ELSE y div ys END").as("vn"))
        .join(v1df, Seq("dim"))
      val sp = v8.agg(sum(col("vn") * col("v1_e6")).as("s"))
      v8.crossJoin(broadcast(sp))
        .withColumn("c", expr(s"CASE WHEN s < 0 THEN -((-s) div $ns) ELSE s div $ns END"))
        .select(col("dim"), col("v1_e6"),
          (col("vn") - expr(s"""CASE WHEN c * v1_e6 < 0
               THEN -((-(c * v1_e6)) div $PCA_VSCALE)
               ELSE (c * v1_e6) div $PCA_VSCALE END""")).as("v2_e6"))
    },
    Some {
      val deflations = (0 to PCA_ROUNDS).map { k =>
        val vin = if (k == 0) "bv0" else s"bv$k"
        s"""bs$k AS (SELECT CAST(SUM(b.v * a.v) AS BIGINT) AS s
             FROM $vin b JOIN a$PCA_ROUNDS a ON b.dim = a.dim),
        bc$k AS (SELECT CASE WHEN s < 0
             THEN -((-s) // GREATEST(n1.n1 // $PCA_VSCALE, 1))
             ELSE s // GREATEST(n1.n1 // $PCA_VSCALE, 1) END AS c
           FROM bs$k, n1),
        bd$k AS MATERIALIZED (
          SELECT b.dim,
            b.v - (CASE WHEN bc.c * a.v < 0
              THEN -((-(bc.c * a.v)) // $PCA_VSCALE)
              ELSE (bc.c * a.v) // $PCA_VSCALE END) AS v
          FROM $vin b JOIN a$PCA_ROUNDS a ON b.dim = a.dim, bc$k bc)"""
      }.mkString(",\n")
      s"""WITH $pcaBaseSql,
        av0 AS (SELECT CAST(r.range AS BIGINT) AS dim,
                  CAST($PCA_VSCALE AS BIGINT) AS v FROM range(0, 64) r),
        ${pcaRoundsSql("a", k => s"av${k - 1}")},
        a$PCA_ROUNDS AS (SELECT dim, v FROM av$PCA_ROUNDS),
        n1 AS (SELECT CAST(SUM(v * v) AS BIGINT) AS n1 FROM a$PCA_ROUNDS),
        bv0 AS (SELECT CAST(r.range AS BIGINT) AS dim,
                  CAST($PCA_VSCALE AS BIGINT) AS v FROM range(0, 64) r),
        ${pcaRoundsSql("b", k => s"bd${k - 1}")},
        $deflations
        SELECT b.dim, a.v AS v1_e6, b.v AS v2_e6
        FROM bd$PCA_ROUNDS b JOIN a$PCA_ROUNDS a ON b.dim = a.dim"""
    })


  /** Explained-variance certificates for the two learned axes: per axis
    * the quantized Rayleigh mass Σ(x·v div 1e7)², the axis norm ‖v‖², the
    * matrix trace Σ‖x‖², and explained_e6 ≈ Σ(x·v)²·1e6/(‖v‖²·trace) —
    * the number a PCA consumer actually quotes ("the top axis carries
    * f% of the variance"). All divisions are nonneg-by-positive after the
    * pinned e7 down-scaling, whose worst-case bounds (wq² ≤ 5e9 per row,
    * vn·tr scaled product ≤ 2.6e18) stay int64-safe to N ≈ 4·10⁹ rows —
    * the main recurrence's documented range. On the near-isotropic gate
    * corpus both axes sit near 1/64 ≈ 15625 e6·µ — the spec pins the
    * expectation band and v1 ≥ v2.
    *
    * Scale shape: the two directions ride the shared driver-pull chains;
    * the certificate itself is two map-side scans (wq per row per axis)
    * + 1-row aggregates — no shuffle beyond the 1-row combines. */
  private val PCA_WQ_DIV = 10000000L
  private val pcaVariance = QueryDef(
    "q_pca_variance",
    (s, d) => {
      val X = pcaX(s, d)
      val v1 = pcaChain1(s, d)(PCA_ROUNDS)
      val v2 = pcaChain2(s, d)(PCA_ROUNDS)
      val trace = X.agg(coalesce(sum(expr(
        """aggregate(xq, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)""")),
        lit(1L)).as("trace"))
      def axisRow(axis: Int, v: Array[Long]): DataFrame = {
        val vn = v.map(x => x * x).sum
        val vnM = math.max(vn / PCA_WQ_DIV, 1L)
        val dotLit = expr(
          s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
              (acc, i) -> acc + element_at(xq, i + 1) *
                element_at(array(${v.mkString(",")}), i + 1))""")
        X.withColumn("w", dotLit)
          .withColumn("wq", expr(
            s"CASE WHEN w < 0 THEN -((-w) div $PCA_WQ_DIV) ELSE w div $PCA_WQ_DIV END"))
          .agg(coalesce(sum(col("wq") * col("wq")), lit(0L)).as("sum_wq2"))
          .crossJoin(broadcast(trace))
          .select(lit(axis.toLong).as("axis"), col("sum_wq2"),
            lit(vn).as("vnorm"), col("trace"),
            expr(s"""sum_wq2 div greatest(
                ($vnM * greatest(trace div $PCA_WQ_DIV, 1)) div 1000000, 1)""")
              .as("explained_e6"))
      }
      axisRow(1, v1).union(axisRow(2, v2))
    },
    Some {
      val deflations = (0 to PCA_ROUNDS).map { k =>
        val vin = if (k == 0) "bv0" else s"bv$k"
        s"""bs$k AS (SELECT CAST(SUM(b.v * a.v) AS BIGINT) AS s
             FROM $vin b JOIN a$PCA_ROUNDS a ON b.dim = a.dim),
        bc$k AS (SELECT CASE WHEN s < 0
             THEN -((-s) // GREATEST(n1.n1 // $PCA_VSCALE, 1))
             ELSE s // GREATEST(n1.n1 // $PCA_VSCALE, 1) END AS c
           FROM bs$k, n1),
        bd$k AS MATERIALIZED (
          SELECT b.dim,
            b.v - (CASE WHEN bc.c * a.v < 0
              THEN -((-(bc.c * a.v)) // $PCA_VSCALE)
              ELSE (bc.c * a.v) // $PCA_VSCALE END) AS v
          FROM $vin b JOIN a$PCA_ROUNDS a ON b.dim = a.dim, bc$k bc)"""
      }.mkString(",\n")
      def axisSql(axis: Int, rel: String, vnormRel: String) =
        s"""SELECT CAST($axis AS BIGINT) AS axis, s.s AS sum_wq2,
          vn.vn AS vnorm, tr.trace,
          s.s // GREATEST(
            ((GREATEST(vn.vn // $PCA_WQ_DIV, 1))
              * GREATEST(tr.trace // $PCA_WQ_DIV, 1)) // 1000000, 1)
            AS explained_e6
        FROM (
          SELECT CAST(COALESCE(SUM(wq * wq), 0) AS BIGINT) AS s FROM (
            SELECT CASE WHEN w < 0 THEN -((-w) // $PCA_WQ_DIV)
              ELSE w // $PCA_WQ_DIV END AS wq
            FROM (
              SELECT x.vec_id, CAST(SUM(x.xv * v.v) AS BIGINT) AS w
              FROM xl x JOIN $rel v USING (dim) GROUP BY 1))) s,
          (SELECT CAST(SUM(v * v) AS BIGINT) AS vn FROM $vnormRel) vn, tr"""
      s"""WITH $pcaBaseSql,
        av0 AS (SELECT CAST(r.range AS BIGINT) AS dim,
                  CAST($PCA_VSCALE AS BIGINT) AS v FROM range(0, 64) r),
        ${pcaRoundsSql("a", k => s"av${k - 1}")},
        a$PCA_ROUNDS AS MATERIALIZED (SELECT dim, v FROM av$PCA_ROUNDS),
        n1 AS (SELECT CAST(SUM(v * v) AS BIGINT) AS n1 FROM a$PCA_ROUNDS),
        bv0 AS (SELECT CAST(r.range AS BIGINT) AS dim,
                  CAST($PCA_VSCALE AS BIGINT) AS v FROM range(0, 64) r),
        ${pcaRoundsSql("b", k => s"bd${k - 1}")},
        $deflations,
        tr AS (SELECT COALESCE(CAST(SUM(xv * xv) AS BIGINT), 1) AS trace FROM xl)
        ${axisSql(1, s"a$PCA_ROUNDS", s"a$PCA_ROUNDS")}
        UNION ALL
        ${axisSql(2, s"bd$PCA_ROUNDS", s"bd$PCA_ROUNDS")}"""
    })

  val all: Seq[QueryDef] =
    Seq(quantize, centroidClassify, jlProject, pcaPower, pcaDeflateQ,
      pcaVariance)
}
