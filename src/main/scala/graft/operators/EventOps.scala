package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table — the operator family the
  * reference lacks entirely ("No range/as-of/interval join operators exist
  * in the reference", SURVEY §2.2 joins note) but that any event/feature
  * pipeline at 100 TB needs. Each is built from Spark primitives in a
  * shape that keeps the work key-partitioned (one shuffle on the natural
  * key, windows inside partitions, banded buckets instead of theta joins),
  * and each is value-checked against DuckDB's native implementation
  * (ASOF JOIN / inequality join / window SQL).
  *
  * `events.ts` arrives as ns-since-epoch LONG (see [[graft.Tables.t]]);
  * DuckDB sees TIMESTAMP_NS and converts via epoch_ns() — both engines
  * then do exact int64 arithmetic, so no float/rounding parity risk.
  */
object EventOps {
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "events")

  /** The tagged view/purchase stream every as-of form consumes: views as
    * side 0 carrying `vid`, purchases as side 1 carrying `pid` (so the
    * (ts, side) order gives ASOF's inclusive `v.ts <= p.ts` bound), in
    * ONE definition — the three as-of variants must stay row-identical,
    * and a tagging change applied to one but not the others would break
    * that silently until test time. `withViewTs` additionally threads the
    * view's own timestamp (null on the purchase side) for tolerance
    * expiry. */
  private def asofTagged(e: DataFrame, withViewTs: Boolean = false): DataFrame = {
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("vid"), lit(null).cast("long").as("pid"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("vid"), col("event_id").as("pid"))
    if (!withViewTs) views.unionByName(purchases)
    else views.withColumn("vts", col("ts"))
      .unionByName(purchases.withColumn("vts", lit(null).cast("long")))
  }

  /** As-of join: for every purchase, the most recent view by the same user
    * at-or-before the purchase time.
    *
    * Spark has no ASOF JOIN operator; the scale-correct formulation is the
    * union + running `last(ignoreNulls)` window: tag both sides, sort each
    * user's merged timeline once, and carry the latest view id forward.
    * One shuffle on `user_id`, no join at all — at 100 TB this is a single
    * hash exchange + per-partition sort, versus the quadratic blowup of a
    * naive `v.ts <= p.ts` theta join (which Spark would execute as
    * BroadcastNestedLoopJoin). Views order before purchases at equal ts
    * (side 0 < side 1), matching ASOF's inclusive `v.ts <= p.ts` bound;
    * (user_id, ts) is unique in this corpus so no further tie-break is
    * needed on the view side. */
  private val asofJoin = QueryDef(
    "q_asof_join",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      asofTagged(ev(s, d))
        .withColumn("matched_view", last(col("vid"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("pid").as("purchase_id"), col("user_id"), col("matched_view"))
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS matched_view
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND v.ts <= p.ts"""))

  /** As-of join with a TOLERANCE bound (the `merge_asof(tolerance=...)`
    * shape): the most recent view at-or-before each purchase, but only if
    * it happened within the last hour — older matches become NULL, the
    * match-expiry semantics every feature pipeline needs ("the feature
    * value must be fresh"). Same union + running-`last` single-exchange
    * shape as [[asofJoin]] (still no join operator): the window also
    * carries the matched view's TIMESTAMP forward, and a final map-side
    * `when` nulls out stale matches. Cost is identical to the unbounded
    * as-of — the tolerance is a projection, not a join predicate, so
    * there is nothing new to probe. The oracle applies the same expiry
    * CASE on top of DuckDB's native ASOF LEFT JOIN. */
  private val asofTolerance = QueryDef(
    "q_asof_tolerance",
    (s, d) => {
      val tolNs = 3600L * 1000 * 1000 * 1000 // 1 hour
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      asofTagged(ev(s, d), withViewTs = true)
        .withColumn("lv", last(col("vid"), ignoreNulls = true).over(w))
        .withColumn("lvts", last(col("vts"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("pid").as("purchase_id"), col("user_id"),
          when(col("lvts") >= col("ts") - tolNs, col("lv"))
            .as("matched_view"))
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id,
      CASE WHEN epoch_ns(v.ts) >= epoch_ns(p.ts) - 3600000000000
        THEN v.event_id END AS matched_view
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND v.ts <= p.ts"""))

  /** [[asofJoin]]'s bounded-buffer form — the scale escape for the
    * documented residual that per-user ordered windows must materialize a
    * user's WHOLE timeline in one task's window buffer (NOTES_r08: "a
    * pathological single-user corpus would be the honest stress"). Here
    * the window key is (user_id, time-chunk), so a monster user's
    * timeline splits across span/chunk tasks and each buffer is bounded
    * by the user's events in ONE chunk, whatever the user's total:
    *
    *  1. within-chunk running `last(view)` — window over (user_id, chunk),
    *     the only pass that touches event-grain rows;
    *  2. a chunk-granularity carry table (one row per ACTIVE (user,
    *     chunk)) records each chunk's final view: a direct
    *     `max_by(vid, when(side = view, ts))` aggregate of the tagged
    *     stream — hash-aggregable (flat long buffer, null orderings
    *     skipped), so its partial phase MAP-SIDE COMBINES below its own
    *     exchange and only chunk-grain rows shuffle; the event stream
    *     itself crosses the wire exactly once, for the window;
    *  3. the per-user prefix `last(ignoreNulls)` over STRICTLY EARLIER
    *     chunks runs on that tiny table (rows per user = active chunks,
    *     bounded by span/chunk — independent of event count);
    *  4. purchases take `coalesce(within-chunk match, carry-in)` via an
    *     UN-hinted left join on (user_id, chunk): the big side leaves the
    *     window both partitioned AND sorted on the join key, so a
    *     sort-merge join costs it neither an exchange nor a sort, while
    *     AQE broadcasts the carry side when it is actually small. A
    *     SHUFFLE_HASH hint was tried and REVERTED: the carry side is one
    *     row per active (user, chunk) — for sparse users that approaches
    *     event grain, and the 100x probe (2M users, 133M events) OOMed
    *     building its forced hash map. The hint pinned the right plan
    *     for the wrong scale; the un-hinted form is sort-free anyway.
    *
    * Correctness at the seams: a view in an earlier chunk is always
    * earlier in time than any purchase in this chunk, equal-ts inclusive
    * matching stays inside step 1's (ts, side) order, `ignoreNulls` in
    * step 3 skips view-less chunks rather than forgetting older matches,
    * and purchase-only chunks still get carry rows (the aggregate runs
    * over BOTH sides, with a null ordering — hence null chunk_last — for
    * every purchase row). Oracle: the SAME DuckDB ASOF LEFT JOIN as
    * [[asofJoin]]; a spec test also pins it row-identical to the plain
    * form. */
  /** Default chunk width: 1 day. The knob trades the two costs the 100x
    * probe measured: NARROWER chunks bound the per-(user, chunk) window
    * buffer tighter (the hot-user win) but grow the carry/seam tables
    * toward event grain for sparse users (one carry row per active
    * (user, chunk)); WIDER chunks do the reverse. 1 day matches the probe
    * corpus (≤48 events/user-day uniform, hot user 30%); a deployment
    * sizes it so (peak events per user per chunk) fits an executor's
    * window buffer while (active user-chunks) stays well under event
    * count. Builders below take the width explicitly; parity at
    * non-default widths is spec-pinned (QueriesSpec "chunked event ops
    * hold parity across chunk widths"). */
  private[graft] val DefaultChunkNs = 24L * 3600 * 1000 * 1000 * 1000

  private[graft] def asofChunkedPlan(s: SparkSession, d: String,
      chunkNs: Long): DataFrame = {
      val tagged = asofTagged(ev(s, d))
        .withColumn("chunk", expr(s"ts div ${chunkNs}L"))
      val wIn = Window.partitionBy(col("user_id"), col("chunk"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = tagged
        .withColumn("local_last", last(col("vid"), ignoreNulls = true).over(wIn))
      val carry = tagged.groupBy(col("user_id"), col("chunk"))
        .agg(max_by(col("vid"), when(col("side") === 0, col("ts")))
          .as("chunk_last"))
      val wc = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carryIn = carry
        .withColumn("carry_in", last(col("chunk_last"), ignoreNulls = true).over(wc))
        .select(col("user_id"), col("chunk"), col("carry_in"))
      local.filter(col("side") === 1)
        .join(carryIn, Seq("user_id", "chunk"), "left")
        .select(col("pid").as("purchase_id"), col("user_id"),
          coalesce(col("local_last"), col("carry_in")).as("matched_view"))
  }

  private val asofChunked = QueryDef(
    "q_asof_chunked",
    (s, d) => asofChunkedPlan(s, d, DefaultChunkNs),
    Some("""SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS matched_view
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND v.ts <= p.ts"""))

  /** Banded range join: for every error event, how many signup events —
    * across ALL users, no equi key — happened within ±60 s.
    *
    * A pure time-interval predicate would plan as a nested-loop join
    * (O(n²) compares). The scale shape: quantize time into 60 s buckets,
    * explode the probe side to its bucket ±1 (any |Δ| <= 60 s pair must
    * land in adjacent buckets), equi-join on the bucket, then verify the
    * exact predicate. Each qualifying pair matches in exactly one bucket
    * (the build side has a single bucket), so no dedup is needed. The
    * bucket key is time — uniformly distributed by construction — and the
    * probe-side explode is a fixed x3, so the join stays a hash join with
    * no hot keys at any scale. DuckDB's oracle runs its native IEJoin on
    * the same predicate. */
  private val rangeJoin = QueryDef(
    "q_range_join",
    (s, d) => {
      val bandNs = 60L * 1000 * 1000 * 1000
      // Integer `div` bucketing: floor(ts / N) would go through double
      // division, and ns timestamps exceed double's mantissa — a pair
      // straddling a bucket edge within the ~190 ns rounding error could
      // silently miss its bucket (the exact-predicate verify can't recover
      // a candidate the bucket join never produced).
      val errors = ev(s, d).filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("ets"))
        .withColumn("bucket",
          explode(array(Seq(-1, 0, 1).map(off =>
            expr(s"ets div ${bandNs}L") + off): _*)))
      val signups = ev(s, d).filter(col("event_type") === "signup")
        .select(col("event_id").as("sig_id"), col("ts").as("sts"))
        .withColumn("bucket", expr(s"sts div ${bandNs}L"))
      errors.join(signups,
          errors("bucket") === signups("bucket") &&
            abs(col("ets") - col("sts")) <= bandNs, "left")
        .groupBy(col("err_id"))
        .agg(count(col("sig_id")).as("n_close"))
    },
    Some("""SELECT e.event_id AS err_id, count(s.event_id) AS n_close
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON abs(epoch_ns(e.ts) - epoch_ns(s.ts)) <= 60000000000
      GROUP BY 1"""))

  /** The shared (user_id, w_start) frame both hopping-window variants
    * aggregate: each event exploded to the k window starts covering it.
    * ONE definition so the exact variant's DuckDB oracle gates the
    * explode/bucketing logic for the sketch variant too — a k or slide
    * change cannot desynchronize their window grids.
    *
    * Integer `div`, never floor(ts / N): ns timestamps (~1.7e18) exceed
    * double's 53-bit mantissa, so float division can misbucket boundary
    * events by one window vs the oracle's exact `//`. */
  private val HOP_SLIDE_NS = 60L * 1000 * 1000 * 1000
  private val HOP_K = 5 // window size = k * slide = 5 minutes
  private def hoppingFrame(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("user_id"),
      explode(array((0 until HOP_K).map(i =>
        (expr(s"ts div ${HOP_SLIDE_NS}L") - i) * HOP_SLIDE_NS): _*)).as("w_start"))

  /** Hopping (sliding) window counts: events and active users per 5-minute
    * window hopping every minute — the windowed-rate view every event
    * pipeline dashboards on. Batch shape of Structured Streaming's
    * `window(ts, "5 minutes", "1 minute")`: size = k·slide, so each event
    * belongs to exactly k=5 windows ([[hoppingFrame]]), then one hash
    * aggregate on the start. The window key is time — uniform by
    * construction — so the single shuffle has no hot keys, the explode
    * factor is a constant (not data-dependent), and distinct-user counts
    * use Spark's partial-distinct aggregation; at 100 TB this is one
    * exchange of k·|events| narrow rows. */
  private val hoppingWindow = QueryDef(
    "q_hopping_window",
    (s, d) =>
      hoppingFrame(s, d)
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users")),
    Some("""SELECT (epoch_ns(e.ts) // 60000000000 - i.range) * 60000000000 AS w_start,
        CAST(count(*) AS BIGINT) AS n_events,
        CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e, range(0, 5) i
      GROUP BY 1"""))

  /** [[hoppingWindow]]'s 100 TB form: windowed ACTIVE-USER counts via the
    * HyperLogLog++ sketch instead of exact distinct. The exact form's
    * partial-dedup state is O(distinct (window, user) pairs) per task —
    * the probe measured its hash maps spilling under local memory
    * pressure at 66M exploded rows — while the sketch is FIXED-SIZE
    * mergeable state per window (map-side combinable, one shuffle of
    * sketches, no second aggregation phase), the standard trade when a
    * dashboard tolerates a small relative error.
    *
    * Sketch VALUES are implementation-specific (no cross-engine value
    * oracle exists), but the sketch's error CONTRACT is checkable: the
    * gated output is `(w_start, n_events, within_2pct)` where Spark
    * co-computes the exact distinct (in a SEPARATE aggregation joined at
    * window grain — see the builder comment) and tests
    * |hll − exact| <= max([[HOP_HLL_TOL]]·exact, [[HOP_HLL_ABS]]) per
    * window; the DuckDB
    * oracle computes the same windows exactly, where the bound holds
    * trivially (TRUE). A sketch regression — rsd drift, merge bug,
    * bucketing skew — flips a boolean and fails the hash gate, so the
    * contract itself is driver-gated rather than spec-only. The sketch
    * runs at rsd 0.02 (rsd 0.01 was tried for extra headroom and measured
    * OUT at sf0.1: its 2^14-register sketches x ~30k open windows of
    * partial-agg state spilled the co-computing aggregate to 27.8 s vs
    * ~1.2 s; HLL error is deterministic per dataset, so the gate check
    * stays deterministic — see [[HOP_HLL_ABS]] for the small-cardinality
    * floor). The
    * production form is the approx-only aggregation — co-computing exact
    * here is the certification harness, not the scale path. */
  private[graft] val HOP_HLL_TOL = 0.02
  /** Absolute floor of the error contract: HLL's multiplicative (rsd)
    * guarantee is asymptotic — at window cardinalities of ~10 (the gate
    * corpus) a pure 2% bound would demand EXACT estimates, where a single
    * register collision in linear counting legitimately shifts the
    * estimate by 1 and a testdata regen could flip the gate
    * nondeterministically. `max(2% relative, ±2 absolute)` is the
    * standard sketch contract shape; a real sketch regression (merge bug,
    * rsd drift) deviates far beyond ±2 across 30k windows. */
  private[graft] val HOP_HLL_ABS = 2.0

  /** The PRODUCTION form of the approx hopping window — the approx-only
    * aggregation with no exact co-computation. The gated query below is
    * the certification harness (it must co-compute exact to emit the
    * error-contract boolean); anything measuring the 100 TB shape — the
    * ScaleProbe — must time THIS plan, or it reintroduces the
    * O(distinct (window, user)) partial-dedup state the sketch exists to
    * avoid and measures the harness instead of the operator. */
  private[graft] def hoppingApproxProductionPlan(s: SparkSession,
      d: String): DataFrame =
    hoppingFrame(s, d)
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
  /** The gated/benched form of the approx hopping window IS the
    * production plan (VERDICT r9 "what's wrong" #4: benching the
    * certification harness read ~2x the production cost). The sketch
    * estimate itself has no cross-engine oracle by nature — Spark's HLL++
    * register layout differs from DuckDB's — so this entry is rows-only;
    * its error CONTRACT stays hash-gated by
    * [[hoppingWindowApproxCert q_hopping_window_approx_cert]]. */
  private val hoppingWindowApprox = QueryDef(
    "q_hopping_window_approx",
    (s, d) => hoppingApproxProductionPlan(s, d),
    None)

  private val hoppingWindowApproxCert = QueryDef(
    "q_hopping_window_approx_cert",
    (s, d) => {
      // Certification shape: exact and sketch in SEPARATE aggregations
      // joined on the window key, NOT one fused agg — a combined
      // distinct + HLL aggregate plans an Expand that doubles the 66M
      // exploded rows and drags the per-window sketch buffers through the
      // distinct branch's hash map (measured 3.1 s fused vs ~2 s split at
      // sf0.1). The join is window-grain (~30k rows), free.
      val exact = hoppingFrame(s, d)
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
      hoppingApproxProductionPlan(s, d)
        .select(col("w_start"), col("n_users_approx"))
        .join(exact, Seq("w_start"))
        .select(col("w_start"), col("n_events"),
          (abs(col("n_users_approx") - col("n_users")) <=
            greatest(col("n_users").cast("double") * HOP_HLL_TOL,
              lit(HOP_HLL_ABS))).as("within_2pct"))
    },
    Some("""SELECT (epoch_ns(e.ts) // 60000000000 - i.range) * 60000000000 AS w_start,
        CAST(count(*) AS BIGINT) AS n_events,
        TRUE AS within_2pct
      FROM events e, range(0, 5) i
      GROUP BY 1"""))

  /** Sessionization: split each user's event stream into sessions at
    * >30 min gaps, then summarize per user. The batch formulation of what
    * streaming/EventStream.scala does with session windows: lag() marks
    * session starts, a running sum numbers them, two aggregations roll up —
    * everything inside one `user_id` partitioning, no data ever leaves its
    * key's partition until the final tiny per-user rollup. */
  private val sessionize = QueryDef(
    "q_sessionize",
    (s, d) => {
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("new_sess",
          when(col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1L)
            .when(lag(col("ts"), 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("sess_events"))
        .groupBy(col("user_id"))
        .agg(max(col("sess")).as("n_sessions"),
          max(col("sess_events")).as("max_session_events"),
          sum(col("sess_events")).as("n_events"))
    },
    Some("""WITH marked AS (
        SELECT user_id, ts, event_id,
          CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
               OR lag(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT user_id,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
        FROM marked
      ), per_sess AS (
        SELECT user_id, sess, count(*) AS sess_events
        FROM numbered GROUP BY 1, 2)
      SELECT user_id, CAST(max(sess) AS BIGINT) AS n_sessions,
        CAST(max(sess_events) AS BIGINT) AS max_session_events,
        CAST(sum(sess_events) AS BIGINT) AS n_events
      FROM per_sess GROUP BY 1"""))

  /** [[sessionize]]'s bounded-buffer form — the same chunking escape as
    * [[asofChunked]], for the other query NOTES_r08 named in the
    * per-user window-buffer residual. Two-level sessionization:
    *
    *  1. event grain, window over (user_id, day-chunk): the standard
    *     lag/running-sum idiom assigns LOCAL session ids — buffers are
    *     bounded by a user's events in one chunk;
    *  2. an exchange-free aggregate (same partitioning) reduces to
    *     session grain: (user, chunk, local sess) -> n_events, min/max ts;
    *  3. the cross-chunk merge is the SAME gap algorithm re-applied at
    *     session grain: per-user sessions ordered by min_ts merge when
    *     `min_ts - lag(max_ts) <= gap`. Within a chunk consecutive local
    *     sessions always have gap > 30 min (that is why they split), so
    *     the uniform rule only ever fuses chunk seams — including chains
    *     across user-inactive chunks, since the gap check uses real
    *     timestamps, not chunk adjacency.
    *
    * The per-user stage-3 window is session-grain: for the dense hot user
    * this residual defends against (millions of events, few sessions) its
    * buffer is tiny. The honest caveat: a user whose every event is its
    * own session (all gaps > 30 min) degenerates stage 3 to event grain —
    * but such a timeline is sparse by construction (≤ 48 events/day),
    * never the monster-timeline case. Oracle: identical SQL to
    * [[sessionize]]; a spec test pins row-parity too. */
  private[graft] def sessionizeChunkedPlan(s: SparkSession, d: String,
      chunkNs: Long): DataFrame = {
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val e = ev(s, d).withColumn("chunk", expr(s"ts div ${chunkNs}L"))
      val wL = Window.partitionBy(col("user_id"), col("chunk"))
        .orderBy(col("ts"), col("event_id"))
      val runL = Window.partitionBy(col("user_id"), col("chunk"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val localSess = e
        .withColumn("new_l",
          when(col("ts") - lag(col("ts"), 1).over(wL) > gapNs, 1L)
            .when(lag(col("ts"), 1).over(wL).isNull, 1L)
            .otherwise(0L))
        .withColumn("l_sess", sum(col("new_l")).over(runL))
        .groupBy(col("user_id"), col("chunk"), col("l_sess"))
        .agg(count(lit(1)).as("n_ev"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      val wS = Window.partitionBy(col("user_id")).orderBy(col("min_ts"))
      val runS = Window.partitionBy(col("user_id")).orderBy(col("min_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      localSess
        .withColumn("new_m",
          when(col("min_ts") - lag(col("max_ts"), 1).over(wS) > gapNs, 1L)
            .when(lag(col("max_ts"), 1).over(wS).isNull, 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("new_m")).over(runS))
        .groupBy(col("user_id"), col("sess"))
        .agg(sum(col("n_ev")).as("sess_events"))
        .groupBy(col("user_id"))
        .agg(max(col("sess")).as("n_sessions"),
          max(col("sess_events")).as("max_session_events"),
          sum(col("sess_events")).as("n_events"))
  }

  private val sessionizeChunked = QueryDef(
    "q_sessionize_chunked",
    (s, d) => sessionizeChunkedPlan(s, d, DefaultChunkNs),
    Some("""WITH marked AS (
        SELECT user_id, ts, event_id,
          CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
               OR lag(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), numbered AS (
        SELECT user_id,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
        FROM marked
      ), per_sess AS (
        SELECT user_id, sess, count(*) AS sess_events
        FROM numbered GROUP BY 1, 2)
      SELECT user_id, CAST(max(sess) AS BIGINT) AS n_sessions,
        CAST(max(sess_events) AS BIGINT) AS max_session_events,
        CAST(sum(sess_events) AS BIGINT) AS n_events
      FROM per_sess GROUP BY 1"""))

  /** Ordered funnel (view -> click -> purchase): how many users reach each
    * stage, where each stage's event must be strictly after the previous
    * stage's first event.
    *
    * Shape: ONE explicit hash repartition of the (column-pruned) stream
    * on user_id, reused by every stage (the three consumers canonicalize
    * to the same exchange, so it is shuffled once and re-read); each
    * stage is a co-partitioned complete-mode hash aggregate computing the
    * stage threshold per user, joined back to the stream as a
    * SHUFFLE_HASH equi join (both sides already partitioned — zero
    * additional exchange, build side is the |users|-row threshold
    * table's partition slice). `ts > t_a` is null when `t_a` is null, so
    * `min(when(...))` stays null — a stage never fires before its
    * predecessor; same three-step shape as the DuckDB oracle CTE.
    *
    * Why not windows, why not broadcast, why not sort-merge — all three
    * were built and probed (round-8 event probe, planted hot user with 1%
    * of all events): chained whole-partition windows buffer each user's
    * timeline in WindowExec once per stage (an extreme user at cluster
    * scale is a single-task spill cliff; also the slowest stable probe
    * walls), running range-frame windows still group-buffer and add a
    * full-stream sort, and the un-hinted join form missed the broadcast
    * estimate and double-sorted the stream via SortMergeJoin (13.5 s max
    * task at 10x). This form has no sort, no window buffer, no broadcast
    * dependence: hash aggregates stream rows through bounded per-user
    * state, so the hottest user costs one hash-map slot, and AQE can
    * still split a skewed join partition. */
  private val funnel = QueryDef(
    "q_funnel",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts"))
        .repartition(col("user_id"))
      val a = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_a"))
      val b = e.join(a.hint("SHUFFLE_HASH"), "user_id")
        .groupBy(col("user_id"))
        .agg(first(col("t_a")).as("t_a"),
          min(when(col("event_type") === "click" && col("ts") > col("t_a"),
            col("ts"))).as("t_b"))
      val c = e.join(b.hint("SHUFFLE_HASH"), "user_id")
        .groupBy(col("user_id"))
        .agg(first(col("t_a")).as("t_a"), first(col("t_b")).as("t_b"),
          min(when(col("event_type") === "purchase" && col("ts") > col("t_b"),
            col("ts"))).as("t_c"))
      c.agg(count(lit(1)).as("n_users"),
          count(col("t_a")).as("n_view"),
          count(col("t_b")).as("n_view_click"),
          count(col("t_c")).as("n_full_funnel"))
    },
    Some("""WITH per AS (
        SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_a
        FROM events GROUP BY user_id),
      b AS (
        SELECT e.user_id, min(epoch_ns(e.ts)) AS t_b
        FROM events e JOIN per ON e.user_id = per.user_id
        WHERE e.event_type = 'click' AND epoch_ns(e.ts) > per.t_a
        GROUP BY e.user_id),
      c AS (
        SELECT e.user_id, min(epoch_ns(e.ts)) AS t_c
        FROM events e JOIN b ON e.user_id = b.user_id
        WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > b.t_b
        GROUP BY e.user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
        CAST(count(t_a) AS BIGINT) AS n_view,
        CAST(count(t_b) AS BIGINT) AS n_view_click,
        CAST(count(t_c) AS BIGINT) AS n_full_funnel
      FROM per
      LEFT JOIN b ON per.user_id = b.user_id
      LEFT JOIN c ON per.user_id = c.user_id"""))

  /** Cohort retention: users bucketed by the epoch-week of their first
    * event; for each (cohort week, weeks-since-first) cell, how many of
    * the cohort's users were active. The first-event table and the event
    * stream co-partition on user_id (one shuffle, reused by the join);
    * week arithmetic is exact int64 division of the ns timestamps — a
    * double division would already be lossy at ns magnitudes (2^53 <
    * 1e18). */
  private val cohortRetention = QueryDef(
    "q_cohort_retention",
    (s, d) => {
      val first = ev(s, d).groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      ev(s, d).join(first, "user_id")
        .withColumn("cohort_wk", expr("t0 div 604800000000000"))
        .withColumn("wk_offset", expr("(ts - t0) div 604800000000000"))
        .groupBy(col("cohort_wk"), col("wk_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH first AS (
        SELECT user_id, min(epoch_ns(ts)) AS t0 FROM events GROUP BY user_id)
      SELECT t0 // 604800000000000 AS cohort_wk,
        (epoch_ns(ts) - t0) // 604800000000000 AS wk_offset,
        CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e JOIN first ON e.user_id = first.user_id
      GROUP BY 1, 2"""))

  /** Native session_window aggregation (the operator behind streaming
    * session windows, here in batch): 30-minute-gap sessions per user via
    * Spark's SessionWindow expression — windows [t, t+gap) merged while
    * overlapping, so an event exactly at the previous session's end
    * starts a NEW session (end-exclusive). The oracle rebuilds the same
    * sessions with the lag/running-sum idiom and a `>= gap` boundary to
    * match the exclusivity. Timestamps: ns LONG -> exact integer div to
    * micros -> timestamp_micros (never float). Complements q_sessionize,
    * which proves the manual idiom on the Spark side too. */
  private val sessionWindow = QueryDef(
    "q_session_window",
    (s, d) => {
      val e = ev(s, d)
        .withColumn("t", timestamp_micros(expr("ts div 1000")))
      e.groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("session_start_us"),
          unix_micros(col("sw.end")).as("session_end_us"),
          col("n_events"))
    },
    Some("""WITH e AS (
        SELECT user_id, epoch_ns(ts) // 1000 AS tus FROM events),
      m AS (
        SELECT user_id, tus,
          CASE WHEN lag(tus) OVER w IS NULL
                 OR tus - lag(tus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      sess AS (
        SELECT user_id, tus,
          SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
      SELECT user_id, MIN(tus) AS session_start_us,
        MAX(tus) + 1800000000 AS session_end_us,
        CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, sid"""))

  /** Time-series gap fill + forward fill: a dense (user, day) spine built
    * from the corpus' day bounds (one-row broadcast + per-user sequence
    * explode — never a data x data product), LEFT-joined to the daily
    * aggregates, then `last(ignoreNulls)` carries the latest observation
    * across the gaps — the feature-engineering stage that turns sparse
    * event streams into dense training features. Day arithmetic is exact
    * int64 ns division; the filled metric is a count (exact), so the
    * oracle compares values bit-for-bit. */
  private val gapFill = QueryDef(
    "q_gap_fill",
    (s, d) => {
      val daily = ev(s, d)
        .withColumn("day", expr("ts div 86400000000000"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"))
      val bounds = daily.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      val grid = daily.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("dmin"), col("dmax"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled_n", last(col("n"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day"), col("n"), col("filled_n"))
    },
    Some("""WITH daily AS (
        SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      b AS (SELECT min(day) AS dmin, max(day) AS dmax FROM daily),
      grid AS (
        SELECT u.user_id, unnest(generate_series(b.dmin, b.dmax)) AS day
        FROM (SELECT DISTINCT user_id FROM daily) u, b)
      SELECT g.user_id, g.day, daily.n,
        last_value(daily.n IGNORE NULLS) OVER (PARTITION BY g.user_id
          ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS filled_n
      FROM grid g LEFT JOIN daily
        ON g.user_id = daily.user_id AND g.day = daily.day"""))

  val all: Seq[QueryDef] =
    Seq(asofJoin, asofTolerance, asofChunked, rangeJoin, sessionize,
      sessionizeChunked, funnel,
      cohortRetention, sessionWindow, gapFill, hoppingWindow, hoppingWindowApprox,
      hoppingWindowApproxCert)
}
