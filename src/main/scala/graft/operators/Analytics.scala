package graft.operators

import graft.{QueryDef, Tables}

/** Analytic-surface extensions: grouping metadata functions, LATERAL
  * correlated subqueries, and a distributed cardinality sketch built from
  * relational primitives only.
  */
object Analytics {

  /** grouping() / grouping_id() over ROLLUP — the metadata functions that
    * let a consumer tell a real NULL group key from a rollup subtotal
    * (datafusion proto:421-430 carries grouping sets; the grouping_id
    * expression is how results stay self-describing). Cast to BIGINT on
    * both sides: Spark returns TINYINT/BIGINT, DuckDB BIGINT. */
  private val groupingFn = QueryDef(
    "q_agg_grouping_fn",
    (s, d) => {
      Tables.register(s, d, "orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""))

  /** LATERAL correlated subquery with ORDER BY + LIMIT (top-2 suppliers
    * per nation): the SQL-surface twin of the window top-k —
    * DecorrelateInnerQuery rewrites the per-row LIMIT into a ranked
    * window, so the executed plan is the same scale-safe partitioned
    * top-k, not a per-nation re-scan. */
  private val lateralTopK = QueryDef(
    "q_lateral",
    (s, d) => {
      Tables.register(s, d, "nation", "supplier")
      s.sql("""SELECT n_name, s_name, s_acctbal
        FROM nation,
        LATERAL (SELECT s_name, s_acctbal FROM supplier
                 WHERE s_nationkey = n_nationkey
                 ORDER BY s_acctbal DESC, s_name LIMIT 2) t""")
    },
    Some("""SELECT n_name, s_name, s_acctbal
      FROM nation,
      LATERAL (SELECT s_name, s_acctbal FROM supplier
               WHERE s_nationkey = n_nationkey
               ORDER BY s_acctbal DESC, s_name LIMIT 2) t"""))

  /** HyperLogLog registers from relational primitives: a 256-bucket HLL
    * over customer keys. Neither engine shares a native 64-bit hash, so
    * the "hash" is a portable 32-bit multiply/xor-shift avalanche mix —
    * every product stays under 2^63 (DuckDB errors on int64 overflow
    * where Spark wraps), every step is exact integer math, and xor/idiv
    * are just spelled per engine (`^`+`div` vs `xor()`+`//`). Avalanche
    * matters: a bare multiplicative mix leaves the bucket byte bijective
    * in the key, so sequential keys spread perfectly evenly and linear
    * counting over-estimates ~50%. The rank is trailing-zeros+1 of the
    * payload via the `bit_count((x & -x) - 1)` identity, so DuckDB
    * checks all 256 registers bit-for-bit. This is the distributed-
    * sketch shape at 100 TB: partial aggregates max registers map-side,
    * the shuffle carries at most 256 rows per partition, and merging
    * sketches = element-wise MAX — the same merge an `Aggregator`-based
    * production HLL would use. (Estimate derivation + the accuracy and
    * mergeability properties are asserted in AnalyticsSpec; the
    * registers ARE the sketch.) */
  private def hllSql(xor: (String, String) => String, idiv: String): String = {
    val mix =
      s"""SELECT ${xor("f", s"f $idiv 65536")} AS h FROM (
            SELECT (e * 1540483477) % 4294967296 AS f FROM (
              SELECT ${xor("c2", s"c2 $idiv 8192")} AS e FROM (
                SELECT (b2 * 2146121005) % 4294967296 AS c2 FROM (
                  SELECT ${xor("a", s"a $idiv 65536")} AS b2 FROM (
                    SELECT (c_custkey * 2654435761) % 4294967296 AS a
                    FROM customer)))))"""
    // The rank payload is 32 - 8 = 24 bits, so a zero payload records the
    // sketch-geometry maximum rho = 24 + 1 (NOT 57, the 64-bit-hash
    // constant): registers must stay inside the range the geometry
    // implies or a consumer that bit-packs/validates them breaks.
    s"""SELECT bucket, MAX(rho) AS max_rho FROM (
        SELECT h % 256 AS bucket,
          CASE WHEN h $idiv 256 = 0 THEN 25
               ELSE CAST(bit_count(((h $idiv 256) & -(h $idiv 256)) - 1) AS BIGINT) + 1
          END AS rho
        FROM ($mix))
      GROUP BY bucket"""
  }

  private[graft] val hllSparkSql: String =
    hllSql((p, q) => s"($p ^ $q)", "div")

  private val sketchHll = QueryDef(
    "q_sketch_hll",
    (s, d) => {
      Tables.register(s, d, "customer")
      s.sql(hllSparkSql)
    },
    Some(hllSql((p, q) => s"xor($p, $q)", "//")))

  /** Recursive CTE (Spark 4's UnionLoop operator): a recursively built
    * month spine LEFT-joined to orders — the "fill gaps in a report
    * axis" use the construct exists for. The recursion happens on the
    * driver-planned loop over tiny frames; the join and aggregate stay
    * distributed. */
  private val recursiveCte = QueryDef(
    "q_recursive_cte",
    (s, d) => {
      Tables.register(s, d, "orders")
      s.sql("""WITH RECURSIVE months(m) AS (
          SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12)
        SELECT m, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON month(o_orderdate) = m AND year(o_orderdate) = 1996
        GROUP BY m""")
    },
    Some("""WITH RECURSIVE months(m) AS (
        SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12)
      SELECT m, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM months LEFT JOIN orders
        ON month(o_orderdate) = m AND year(o_orderdate) = 1996
      GROUP BY m"""))

  /** observe() / CollectMetricsExec: named aggregate metrics collected on
    * the rows of a pass WITHOUT a second scan — the runtime-metrics
    * surface a gateway exposes per query (the reference streams
    * TaskMetrics the same way, dist/src/runtime.rs:598-686). The query
    * runs one action to drive rows through the metrics node, then
    * returns the observed values as a relation; the oracle recomputes
    * them with plain aggregates. */
  private val observeMetrics = QueryDef(
    "q_observe_metrics",
    (s, d) => {
      import org.apache.spark.sql.Observation
      import org.apache.spark.sql.functions._
      val obs = Observation()
      val base = Tables.t(s, d, "lineitem")
        .filter(col("l_quantity") > 10)
        .observe(obs, count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"))
      base.write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      // sum/min/max observe as NULL on an empty pass — keep them nullable
      // (a bare asInstanceOf[Long] would silently unbox null to 0).
      def opt(k: String): Option[Long] = Option(m(k)).map(_.asInstanceOf[Long])
      Seq((m("n_rows").asInstanceOf[Long], opt("sum_qty"), opt("min_key"),
        opt("max_key")))
        .toDF("n_rows", "sum_qty", "min_key", "max_key")
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
      FROM lineitem WHERE l_quantity > 10"""))

  /** Spark 4 VARIANT: parse the semi-structured `events.props` JSON into
    * the binary variant encoding once, then typed-path-extract inside
    * aggregates — the open-schema column shape for event payloads at
    * scale (parse once per row, extract many times, no per-path string
    * re-parsing). The oracle extracts the same path with DuckDB's JSON
    * operators. */
  private val variantExtract = QueryDef(
    "q_variant",
    (s, d) => {
      Tables.register(s, d, "events")
      s.sql("""SELECT event_type, count(*) AS n,
        CAST(SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS sum_k,
        MIN(variant_get(parse_json(props), '$.k', 'bigint')) AS min_k,
        MAX(variant_get(parse_json(props), '$.k', 'bigint')) AS max_k
        FROM events GROUP BY event_type""")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
      MIN(CAST(props::JSON ->> 'k' AS BIGINT)) AS min_k,
      MAX(CAST(props::JSON ->> 'k' AS BIGINT)) AS max_k
      FROM events GROUP BY event_type"""))

  /** Z-order (Morton) layout audit: interleave the low 16 bits of two
    * join/filter keys into one clustering value, bucket the data by its
    * high byte, and report each bucket's per-dimension key envelopes.
    * This is the data-layout side of 100 TB pruning: files written in
    * z-value order give BOTH dimensions bounded min/max ranges per file
    * (the envelopes this query emits), so parquet row-group stats can
    * prune on either key — a single-key sort bounds one dimension and
    * leaves the other spanning the full domain. Exact integer bit math,
    * generated per engine only because the shift syntax differs
    * (shiftleft/shiftright vs <</>>). */
  private def zorderSql(shl: (String, Int) => String,
      shr: (String, Int) => String): String = {
    val terms = (0 until 16).flatMap { b =>
      Seq(shl(s"(${shr("x", b)} & 1)", 2 * b),
        shl(s"(${shr("y", b)} & 1)", 2 * b + 1))
    }
    s"""SELECT ${shr("z", 24)} AS z_bucket,
        CAST(count(*) AS BIGINT) AS n,
        min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi
      FROM (
        SELECT x, y, ${terms.mkString(" + ")} AS z FROM (
          SELECT l_orderkey % 65536 AS x, l_partkey % 65536 AS y
          FROM lineitem))
      GROUP BY 1"""
  }

  private val zorder = QueryDef(
    "q_zorder_layout",
    (s, d) => {
      Tables.register(s, d, "lineitem")
      s.sql(zorderSql((e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)"))
    },
    Some(zorderSql((e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")))

  /** Numeric feature binning: a fixed-width 20-bucket histogram of order
    * totals — the discretization stage before feature crosses or
    * monotonic-binning models, and the shape of every data-profiling
    * scan. Pure map + tiny aggregate (20 groups). The bucket expression
    * is one subtraction, one multiply, one divide, one floor — identical
    * IEEE order on both engines, clamped to [0, 19] so the domain edge
    * lands in the last bucket on both. */
  private val featureBinning = QueryDef(
    "q_feature_binning",
    (s, d) => {
      Tables.register(s, d, "orders")
      s.sql("""SELECT
          least(CAST(floor((o_totalprice - 0.0) * 20 / 600000.0) AS BIGINT), 19) AS bucket,
          count(*) AS n,
          CAST(min(o_totalprice) AS DOUBLE) AS lo,
          CAST(max(o_totalprice) AS DOUBLE) AS hi
        FROM orders GROUP BY 1""")
    },
    Some("""SELECT
        least(CAST(FLOOR((o_totalprice - 0.0) * 20 / 600000.0) AS BIGINT), 19) AS bucket,
        CAST(count(*) AS BIGINT) AS n,
        CAST(min(o_totalprice) AS DOUBLE) AS lo,
        CAST(max(o_totalprice) AS DOUBLE) AS hi
      FROM orders GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(groupingFn, lateralTopK, sketchHll, recursiveCte, observeMetrics,
      variantExtract, zorder, featureBinning)
}
