package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared pinned-integer PageRank machinery — the recurrence behind
  * Dedup's q_pagerank (doc graph) and TextAnalysis's q_textrank (word
  * graph). Lives in its own init-dependency-free object: both consumers
  * reference it DURING their own object initialization (the oracle SQL
  * strings interpolate [[pagerankCtesSql]]), and routing it through either
  * module would re-create the TextAnalysis -> Dedup -> Sampling ->
  * TextAnalysis init cycle that NPEs module access mid-init.
  *
  * Recurrence (identical on both engines, all int64): pr0 = 1e9 div n;
  * each round every node emits pr div deg along every out-edge and
  * absorbs base + (85·inflow) div 100, base = (15·(1e9 div n)) div 100.
  * 8 rounds, a plan constant (see q_pagerank's scaladoc for why).
  */
object GraphOps {

  /** THE round loop — the single source of the recurrence for both
    * [[integerPagerank]] and [[integerPagerankResidual]] (ADVICE r11: two
    * copy-pasted loops let a future edit silently diverge the certified
    * recurrence from the one q_pagerank runs). Returns (round-8 state,
    * round-7 state), each (node, deg, base, pr).
    *
    * r16 note (guide §1.1 — the empirical loop decides): the §2.4
    * co-partitioned form of this loop (edges keyed-checkpointed by `src`
    * once via an AQE-off repartition+localCheckpoint so the partitioning
    * survives into the LogicalRDD, a static (deg, base) side keyed by
    * `node`, one exchange per round) was built, oracle-verified, and
    * MEASURED SLOWER at sf0.1/sf1 graph sizes — because AQE already
    * coalesces this plan's per-round shuffles of these small graphs to
    * ~1 task, while the keyed setup adds materialization + sizing jobs
    * that never pay for themselves below millions of edges (details in
    * OPTIMIZATION_r16.md). The shuffle-per-round form is the measured
    * optimum in the regime the gated corpora occupy. */
  private def pagerankRounds(edges0: DataFrame): (DataFrame, DataFrame) = {
    val edges = edges0.toDF("src", "dst").localCheckpoint()
    // r16 (guide §1.2 step 1 — fewer materialization jobs, same recurrence):
    // (node, deg, base) never changes across rounds, so it is checkpointed
    // ONCE as a static side instead of being re-derived from (and carried
    // through) every per-round checkpoint. The old loop referenced `ranks`
    // twice per round (contrib AND the update's left side), which forced a
    // checkpoint every round to stop 2^k subtree duplication; the update
    // now reads the static side, `ranks` is referenced exactly once per
    // round, and the whole 8-round chain plans linearly — one checkpoint
    // at round 7 (the residual consumer needs a stable r7 to join against
    // r8 without recomputing rounds 1-7 twice) replaces eight. Values are
    // bit-identical: same joins, same int64 recurrence, same left_outer
    // null handling (differential specs + oracle re-verified).
    val nodes = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
    val base = nodes
      .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
      .select(col("node"), col("deg"),
        expr("(15 * (1000000000 div n)) div 100").as("base"),
        expr("1000000000 div n").as("pr0"))
      .localCheckpoint()
    var ranks = base.select(
      col("node"), col("deg"), col("base"), col("pr0").as("pr"))
    var prev = ranks
    for (r <- 1 to 8) {
      prev = ranks
      val contrib = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = base.select(col("node"), col("deg"), col("base"))
        .join(contrib, col("node") === col("dst"), "left_outer")
        .select(col("node"), col("deg"), col("base"),
          (col("base") + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
      if (r == 7) ranks = ranks.localCheckpoint()
    }
    (ranks, prev)
  }

  /** Power iteration over a symmetrized (src, dst) edge relation. Each
    * round is one node-keyed equi join plus a dst-keyed partial-agg
    * shuffle of (node, long) pairs; the static (node, deg, base) side is
    * checkpointed once and the single-reference round chain plans
    * linearly (one checkpoint at round 7 for the residual consumer).
    * Returns (node, deg, pr). */
  def integerPagerank(edges0: DataFrame): DataFrame =
    pagerankRounds(edges0)._1.select(col("node"), col("deg"), col("pr"))

  /** The matching unrolled DuckDB rounds: expects a CTE `e(src, dst)` in
    * scope, defines nodes/nn/r0..r8; consumers SELECT FROM r8. Rounds are
    * MATERIALIZED — an inlined round would re-evaluate the (possibly
    * all-pairs) edge CTE once per unrolled reference. */
  def pagerankCtesSql: String = {
    val iters = (1 to 8).map { k =>
      s"""r$k AS MATERIALIZED (
        SELECT n.node, n.deg, n.base,
          n.base + (85 * COALESCE(s.inflow, 0)) // 100 AS pr
        FROM r0base n LEFT JOIN (
          SELECT e.dst AS node, CAST(SUM(r.pr // r.deg) AS BIGINT) AS inflow
          FROM e JOIN r${k - 1} r ON e.src = r.node GROUP BY 1) s
        ON n.node = s.node)"""
    }.mkString(",\n")
    s"""nodes AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
              FROM e GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      r0base AS MATERIALIZED (
        SELECT node, deg, (15 * (1000000000 // nn.n)) // 100 AS base
        FROM nodes, nn),
      r0 AS MATERIALIZED (
        SELECT node, deg, base, 1000000000 // nn.n AS pr FROM r0base, nn),
      $iters"""
  }

  /** [[integerPagerank]]'s last two rounds side by side — the convergence
    * witness: consumers certify that the plan-constant 8-round budget has
    * actually quieted the walk (max |pr8 − pr7| and how many nodes still
    * moved). Same recurrence, same per-round checkpoints. */
  def integerPagerankResidual(edges0: DataFrame): DataFrame = {
    val (r8, r7) = pagerankRounds(edges0)
    r8.select(col("node"), col("pr").as("pr8"))
      .join(r7.select(col("node"), col("pr").as("pr7")), Seq("node"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007), determinized:
    * l0(v) = v; each round every node adopts the MODE of its neighbors'
    * previous-round labels under the pinned (count desc, label asc) total
    * order. The async/randomized variants of LPA are irreproducible by
    * design; the synchronous pinned form is bit-stable on both engines,
    * and — like [[integerPagerank]]'s fixed 8 rounds — the iteration
    * budget is a plan constant ([[LPA_ROUNDS]]): the OUTPUT is defined as
    * the round-k state whether or not the fixpoint arrived (the k-core
    * precedent).
    *
    * Scale shape: per round one node-keyed equi join, a (node, label)
    * partial-agg shuffle, and a per-node window argmax PARTITIONED by the
    * node key (never a global window); a mid-loop localCheckpoint caps
    * lineage. Labels are node ids — longs — so nothing wider than an
    * (id, id, count) triple ever moves. */
  val LPA_ROUNDS = 4

  /** Labels after [[LPA_ROUNDS]] synchronous rounds over a symmetrized
    * (src, dst) edge relation. Returns (node, label). */
  def labelPropagation(edges0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = edges0.toDF("src", "dst").localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // r16 (guide §1.2 step 1): `labels` is referenced exactly once per
    // round, so the chain plans linearly without per-round checkpoints —
    // one mid-loop checkpoint (round 2) bounds plan depth at two rounds
    // and halves the eager materialization jobs. Same joins, same pinned
    // (count desc, label) argmax; differential spec + oracle unchanged.
    for (r <- 1 to LPA_ROUNDS) {
      labels = edges.join(labels, edges("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("dst")).orderBy(col("c").desc, col("label"))))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("label"))
      if (r == 2) labels = labels.localCheckpoint()
    }
    labels
  }

  /** The matching unrolled DuckDB rounds: expects `e(src, dst)` in scope,
    * defines l0..l{LPA_ROUNDS}; consumers SELECT FROM l{LPA_ROUNDS}.
    * MATERIALIZED for the same re-evaluation reason as [[pagerankCtesSql]]. */
  def lpaCtesSql: String = {
    val iters = (1 to LPA_ROUNDS).map { k =>
      s"""lc$k AS (
        SELECT e.dst AS node, l.label, CAST(COUNT(*) AS BIGINT) AS c
        FROM e JOIN l${k - 1} l ON e.src = l.node GROUP BY 1, 2),
      l$k AS MATERIALIZED (
        SELECT node, label FROM (
          SELECT node, label,
            ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
          FROM lc$k) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e),
      $iters"""
  }
}
