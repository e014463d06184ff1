package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The relational operator surface proven by the reference's distributed
  * path (SURVEY.md §2.2; wire inventory `networks/tonic/gen/proto/
  * datafusion.proto:699-734`, slt corpus `integration-tests/tests/
  * sqllogictest.slt:1-301`). Each query exercises one §2 row, Spark-first:
  * declarative DataFrame/SQL plans so Catalyst does pushdown, pruning,
  * partial aggregation and join selection.
  *
  * Oracle-parity conventions (DuckDB runs the oracle on the same parquet):
  *   - money/quantity sums go through DECIMAL(18,2): exact in both engines,
  *     immune to float summation order (Spark sums partials per partition).
  *   - averages = exact decimal sum cast to double, divided by count —
  *     one IEEE division with identical operands on both sides.
  *   - double->int conversions use floor/round explicitly (Spark CAST
  *     truncates, DuckDB CAST rounds — never rely on CAST).
  *   - `events.ts` is ns in parquet; Spark truncates to µs. Never output a
  *     raw `ts`; order-by ties are broken with `event_id`.
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.t(s, d, n)

  /** Exact decimal sum surfaced as double (see conventions above). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  private val DSUM = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact revenue sum: `price * (1 - discount)` with the *operands* cast to
    * decimal first. Doing the arithmetic in double and casting the product
    * rounds penny ties differently in Spark (HALF_UP) vs DuckDB
    * (half-to-even); decimal-in, decimal-out is exact in both engines
    * (round-1 hash-FAIL root cause for q1_agg/q_join_inner). */
  private def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2))))
      .cast(DoubleType)
  private val DREV = "CAST(SUM(CAST(%s AS DECIMAL(18,2)) * " +
    "(CAST(1 AS DECIMAL(18,2)) - CAST(%s AS DECIMAL(18,2)))) AS DOUBLE)"

  // ---------------------------------------------------------------- scans

  /** ParquetScanExecNode w/ projection + predicate pushdown (proto:1012-1021).
    * `.explain` must show PushedFilters + 3-column ReadSchema. */
  private val scanProject = QueryDef(
    "q_scan_project",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < to_timestamp(lit("1995-06-01")))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate")),
    Some("SELECT l_orderkey, l_extendedprice, l_shipdate FROM lineitem " +
      "WHERE l_shipdate < TIMESTAMP '1995-06-01'"))

  /** Complex predicate: AND/OR/NOT/BETWEEN/IN (FilterExec, proto:975-980). */
  private val filterComplex = QueryDef(
    "q_filter_complex",
    (s, d) =>
      t(s, d, "orders")
        .filter((col("o_totalprice").between(1000, 50000) &&
          col("o_orderstatus").isin("O", "F")) ||
          (!col("o_orderpriority").startsWith("1") && col("o_custkey") % 10 === 3))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
      WHERE (o_totalprice BETWEEN 1000 AND 50000 AND o_orderstatus IN ('O','F'))
         OR (NOT o_orderpriority LIKE '1%' AND o_custkey % 10 = 3)"""))

  /** PlaceholderRowExecNode — `SELECT 1` (proto:1136-1138; the reference's
    * health-check fast path, dist/src/util.rs:33-51). */
  private val selectOne = QueryDef(
    "q_select_one",
    (s, _) => s.sql("SELECT 1 AS one"),
    Some("SELECT 1 AS one"))

  /** EmptyExecNode — zero-row source (proto:1132-1134). */
  private val emptyRel = QueryDef(
    "q_empty",
    (s, _) => s.sql("SELECT 1 AS one").where(lit(false)),
    Some("SELECT 1 AS one WHERE false"))

  /** GenerateSeriesNode (proto:1346-1356) — `spark.range` is Spark's
    * native distributed series generator. */
  private val genSeries = QueryDef(
    "q_generate_series",
    (s, _) => s.range(1, 101).select(col("id").as("i")),
    Some("SELECT generate_series AS i FROM generate_series(1, 100)"))

  // ---------------------------------------------------------------- joins

  /** Partitioned HashJoinExec (proto:1058-1073; slt:23-36): the two big
    * fact tables shuffle on the join key; aggregation is partial/final.
    * At 100 TB this is the canonical co-partitioned shuffle join — AQE
    * handles skew; no broadcast (both sides large). */
  private val joinInner = QueryDef(
    "q_join_inner",
    (s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""SELECT o_orderstatus, ${DREV.format("l_extendedprice", "l_discount")} AS revenue,
      COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus"""))

  /** CollectLeft HashJoinExec = broadcast join (proto:1059; slt:44-47).
    * nation/region are tiny dims — explicit `broadcast()` so no shuffle of
    * the fact side is wasted on them at any scale. */
  private val joinBroadcast = QueryDef(
    "q_join_broadcast",
    (s, d) => {
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
    },
    Some(s"""SELECT r_name, COUNT(*) AS n_cust, ${DSUM.format("c_acctbal")} AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"""))

  /** LEFT OUTER join with NULL-producing right side (JoinType LEFT,
    * datafusion_common.proto:84; deliberately deferred in the reference's
    * slt:160-164 — un-deferred here per SURVEY §5). */
  private val joinLeft = QueryDef(
    "q_join_left",
    (s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").filter(col("c_acctbal") > 5000)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
    },
    Some("""SELECT o_orderkey, c_custkey, c_name FROM orders
      LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o_custkey = c_custkey"""))

  /** RIGHT OUTER join (JoinType RIGHT). */
  private val joinRight = QueryDef(
    "q_join_right",
    (s, d) => {
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000)
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
      FROM (SELECT * FROM orders WHERE o_totalprice > 100000) o
      RIGHT JOIN customer ON o_custkey = c_custkey"""))

  /** FULL OUTER join, both sides producing unmatched rows. */
  private val joinFull = QueryDef(
    "q_join_full",
    (s, d) => {
      val c = t(s, d, "customer").filter(col("c_nationkey") < 10)
        .select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey"), col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(col("c_custkey"), col("c_nationkey"), col("o_orderkey"))
    },
    Some("""SELECT c_custkey, c_nationkey, o_orderkey
      FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 10) c
      FULL JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 150000) o
      ON c_custkey = o_custkey"""))

  /** LEFT SEMI join = EXISTS (JoinType LEFT_SEMI, proto common:87). */
  private val joinSemi = QueryDef(
    "q_join_semi",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""SELECT c_custkey, c_name FROM customer WHERE EXISTS
      (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)"""))

  /** LEFT ANTI join = NOT EXISTS (JoinType LEFT_ANTI, proto common:88). */
  private val joinAnti = QueryDef(
    "q_join_anti",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
      (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** CrossJoinExec (proto:714; slt:8-15) — 5×25 rows, driver-cheap. */
  private val joinCross = QueryDef(
    "q_join_cross",
    (s, d) => {
      val r = t(s, d, "region").select(col("r_name"))
      val n = t(s, d, "nation").select(col("n_name"))
      r.crossJoin(n)
    },
    Some("SELECT r_name, n_name FROM region CROSS JOIN nation"))

  /** NestedLoopJoinExec — pure theta join (proto:1226-1232; slt:17-21,
    * planner.rs:52-72: `t1.age > t2.age`). */
  private val joinTheta = QueryDef(
    "q_join_theta",
    (s, d) => {
      val s1 = t(s, d, "supplier").as("s1")
      val s2 = t(s, d, "supplier").as("s2")
      s1.join(s2, col("s1.s_acctbal") > col("s2.s_acctbal"))
        .groupBy(col("s1.s_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("n_poorer"))
    },
    Some("""SELECT s1.s_suppkey AS s_suppkey, COUNT(*) AS n_poorer
      FROM supplier s1 JOIN supplier s2 ON s1.s_acctbal > s2.s_acctbal
      GROUP BY s1.s_suppkey"""))

  /** Null-safe equality join — HashJoinExec `null_equality` flag
    * (proto:1069; Spark `<=>`, SQL IS NOT DISTINCT FROM). The key is
    * high-cardinality (custkey % 1000, with 0 → NULL) so output stays
    * linear and no shuffle partition is skewed — a 5-value key here made
    * the join quadratic at scale (round-1 perf-weak #2); `<=>` matching
    * NULL = NULL is still exercised by the nulled residue class. */
  private val joinNullSafe = QueryDef(
    "q_join_nullsafe",
    (s, d) => {
      val c1 = t(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_custkey") % 1000, lit(0)).as("k1"))
        .as("a")
      val c2 = t(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_custkey") % 1000, lit(0)).as("k2"))
        .as("b")
      c1.join(c2, col("k1") <=> col("k2"))
        .groupBy(col("k1"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some("""SELECT k1, COUNT(*) AS n_pairs FROM
      (SELECT c_custkey, nullif(c_custkey % 1000, 0) AS k1 FROM customer) a
      JOIN (SELECT c_custkey, nullif(c_custkey % 1000, 0) AS k2 FROM customer) b
      ON k1 IS NOT DISTINCT FROM k2 GROUP BY k1"""))

  // ----------------------------------------------------------- aggregation

  /** The flagship: TPC-H Q1-shaped pricing summary. Partial→Final hash
    * aggregation over a shuffle (proto:1146-1152, slt:90-158); map-side
    * combine means the shuffle carries ~|groups| rows per partition. */
  private val q1Agg = QueryDef(
    "q1_agg",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          drevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")),
    Some(s"""SELECT l_returnflag, l_linestatus,
        ${DSUM.format("l_quantity")} AS sum_qty,
        ${DSUM.format("l_extendedprice")} AS sum_base_price,
        ${DREV.format("l_extendedprice", "l_discount")} AS sum_disc_price,
        ${DSUM.format("l_quantity")} / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** Global aggregate, no GROUP BY (slt:149-153). */
  private val aggGlobal = QueryDef(
    "q_agg_global",
    (s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("total_qty"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key")),
    Some(s"""SELECT COUNT(*) AS n, ${DSUM.format("l_quantity")} AS total_qty,
      MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key FROM lineitem"""))

  /** HAVING = post-aggregate filter (slt:102-107). */
  private val aggHaving = QueryDef(
    "q_agg_having",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 5),
    Some(s"""SELECT o_custkey, COUNT(*) AS n_orders, ${DSUM.format("o_totalprice")} AS spend
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5"""))

  /** SELECT DISTINCT = group-by-all-columns aggregate (slt:51-56). */
  private val distinctRows = QueryDef(
    "q_distinct",
    (s, d) =>
      t(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))

  /** Distinct aggregates (PhysicalAggregateExprNode.distinct, proto:869-879).
    * Spark expands to a two-level aggregate; stays partial/final distributed. */
  private val aggCountDistinct = QueryDef(
    "q_agg_count_distinct",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag"""))

  /** Aggregate FILTER clause (proto:1170-1172,1194). */
  private val aggFilter = QueryDef(
    "q_agg_filter",
    (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          dsum(when(col("l_discount") > 0.05, col("l_extendedprice"))).as("hi_disc_price"),
          count(when(col("l_returnflag") === "R", lit(1))).as("n_returned")),
    Some(s"""SELECT l_linestatus,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS hi_disc_price,
      COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
      FROM lineitem GROUP BY l_linestatus"""))

  /** ROLLUP (logical RollupNode, proto:421-430). */
  private val aggRollup = QueryDef(
    "q_agg_rollup",
    (s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total")),
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      ${DSUM.format("o_totalprice")} AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""))

  /** CUBE (logical CubeNode). */
  private val aggCube = QueryDef(
    "q_agg_cube",
    (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Explicit GROUPING SETS (proto:1192-1193). */
  private val aggGroupingSets = QueryDef(
    "q_agg_grouping_sets",
    (s, d) => {
      Tables.register(s, d, "orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""))

  /** Exact interpolated percentiles. Parity rests on both engines
    * producing bit-identical interpolated doubles (verified empirically on
    * the gate data — same lerp arithmetic); the cents truncation is
    * presentation, not an ulp guard (a 1-ulp divergence exactly on a cent
    * boundary would still flip the floor). Scale note: Spark's exact
    * `percentile` buffers a per-group distinct-value map — fine for the
    * grouped-by-status probe here, but a 100 TB continuous distribution
    * wants `approx_percentile` (t-digest, mergeable partials); exact is
    * the correctness oracle, approx is the scale path. */
  private val aggPercentile = QueryDef(
    "q_agg_percentile",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          floor(expr("percentile(o_totalprice, 0.5)") * 100).as("med_c"),
          floor(expr("percentile(o_totalprice, 0.9)") * 100).as("p90_c"),
          count(lit(1)).as("n")),
    Some("""SELECT o_orderstatus,
      CAST(FLOOR(quantile_cont(o_totalprice, 0.5) * 100) AS BIGINT) AS med_c,
      CAST(FLOOR(quantile_cont(o_totalprice, 0.9) * 100) AS BIGINT) AS p90_c,
      COUNT(*) AS n FROM orders GROUP BY o_orderstatus"""))

  /** Ordered string aggregation (LISTAGG family): collect + sort + join —
    * deterministic output independent of partitioning. */
  private val aggStringAgg = QueryDef(
    "q_agg_stringagg",
    (s, d) =>
      t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("names")),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey"""))

  /** NULL group keys form their own group (slt:136-147). */
  private val aggNullKeys = QueryDef(
    "q_agg_null_keys",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio"))
        .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("n_keys")),
    Some("""SELECT nullif(o_orderpriority, '1-URGENT') AS prio, COUNT(*) AS n,
      COUNT(o_orderkey) AS n_keys FROM orders GROUP BY 1"""))

  // --------------------------------------------------------------- windows

  /** BoundedWindowAggExec: rank + top-1-per-group filter — the reference's
    * own window test (planner.rs:221-249, slt:65-71). Ties all surface
    * (rank semantics) so the result set is deterministic. */
  private val windowRank = QueryDef(
    "q_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc_nulls_last)
      t(s, d, "lineitem")
        .withColumn("rk", rank().over(w))
        .filter(col("rk") === 1)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rk"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rk FROM
      (SELECT *, RANK() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC NULLS LAST) AS rk
       FROM lineitem) WHERE rk = 1"""))

  /** Window value functions + distribution functions (the rest of the
    * UDWF surface, proto:881-895): first/last/nth_value with explicit
    * frames, percent_rank, cume_dist. last_value needs the
    * unbounded-following frame (the default frame ends at CURRENT ROW,
    * where last_value degenerates to the current row) — same spelling in
    * the oracle. Partitioned by status — scale-safe. */
  private val windowValueFns = QueryDef(
    "q_window_value_fns",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .filter(col("o_custkey") % 50 === 0)
        .select(col("o_orderstatus"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(full).as("last_price"),
          nth_value(col("o_totalprice"), 3).over(full).as("third_price"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
        FIRST_VALUE(o_totalprice) OVER w AS first_price,
        LAST_VALUE(o_totalprice) OVER
          (PARTITION BY o_orderstatus ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        NTH_VALUE(o_totalprice, 3) OVER
          (PARTITION BY o_orderstatus ORDER BY o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_price,
        PERCENT_RANK() OVER w AS pr,
        CUME_DIST() OVER w AS cd
      FROM orders WHERE o_custkey % 50 = 0
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)"""))

  /** row_number / dense_rank / ntile / percent_rank over a total order. */
  private val windowRanks = QueryDef(
    "q_window_ranking",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          dense_rank().over(w).as("dr"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 50)
    },
    Some("""SELECT o_orderstatus, o_orderkey, rn, dr, quartile FROM
      (SELECT o_orderstatus, o_orderkey,
         ROW_NUMBER() OVER w AS rn, DENSE_RANK() OVER w AS dr, NTILE(4) OVER w AS quartile
       FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 50"""))

  /** ROWS frame: running sum (frame units proto:597-622). */
  private val windowRunning = QueryDef(
    "q_window_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType).as("running_spend"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders"""))

  /** RANGE frame with numeric offset (proto:609-615).
    *
    * A global `ORDER BY` window with no PARTITION BY funnels every row into
    * one partition on one executor — fine at sf0.1, OOM at 100 TB (round-1
    * perf-weak #1). Scale-safe shape: partition by a key bucket much wider
    * than the frame (W=10,000 ≫ 100) and lend each bucket the previous
    * bucket's top-`100` rows so frames that straddle the boundary still see
    * them; borrowed rows are counted but not emitted. The oracle keeps the
    * naive global-window SQL — same semantics, so the hash must match.
    */
  private val windowRange = QueryDef(
    "q_window_range",
    (s, d) => {
      val W = 10000L
      val base = t(s, d, "orders")
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_orderkey"))
      val real = base
        .withColumn("bucket", floor(col("o_orderkey") / W))
        .withColumn("is_real", lit(true))
      val borrowed = base
        .filter(col("o_orderkey") % W >= W - 100)
        .withColumn("bucket", floor(col("o_orderkey") / W) + 1)
        .withColumn("is_real", lit(false))
      val w = Window.partitionBy(col("bucket")).orderBy(col("o_orderkey"))
        .rangeBetween(-100, Window.currentRow)
      real.unionByName(borrowed)
        .select(col("o_orderkey"), count(lit(1)).over(w).as("n_near"), col("is_real"))
        .filter(col("is_real"))
        .select(col("o_orderkey"), col("n_near"))
    },
    Some("""SELECT o_orderkey, COUNT(*) OVER
      (ORDER BY o_orderkey RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_near
      FROM orders WHERE o_custkey % 100 = 0"""))

  /** GROUPS frame emulation (frame units proto:597-622 list
    * ROWS/RANGE/GROUPS; Spark has no GROUPS mode, and the oracle engine
    * here — DuckDB 1.0.0 — rejects it too ("GROUPS mode for window
    * functions is not implemented yet"; newer DuckDB does support it), so
    * the semantics are delivered by rewrite on both sides: `GROUPS BETWEEN
    * 1 PRECEDING AND CURRENT ROW` ≡ dense_rank() the peer groups, then a
    * RANGE frame of width 1 over the rank. The rewrite itself is verified
    * against native GROUPS semantics in QueriesSpec on a hand-computed
    * fixture. Both windows share the partition key — one shuffle,
    * scale-safe. */
  private val windowGroups = QueryDef(
    "q_window_groups",
    (s, d) => {
      val byDate = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderdate"))
      val byGrp = Window.partitionBy(col("o_orderstatus")).orderBy(col("g"))
        .rangeBetween(-1, Window.currentRow)
      t(s, d, "orders")
        .withColumn("g", dense_rank().over(byDate))
        .select(col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(byGrp)
            .cast(DoubleType).as("grp_sum"))
    },
    Some("""SELECT o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_orderstatus ORDER BY g
        RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE) AS grp_sum
      FROM (SELECT o_orderkey, o_orderstatus, o_totalprice,
              DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS g
            FROM orders)"""))

  /** lead/lag navigation over event streams (UDWF surface, proto:881-895). */
  private val windowLeadLag = QueryDef(
    "q_window_lead_lag",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
    },
    Some("""SELECT user_id, event_id, value,
      LAG(value, 1) OVER w AS prev_value, LEAD(value, 1) OVER w AS next_value
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  // ---------------------------------------------------------- sorts/limits

  /** Multi-key sort with explicit NULLS FIRST/LAST (slt:166-204; Spark and
    * DataFusion default null ordering differs — always explicit, SURVEY §7). */
  private val sortNulls = QueryDef(
    "q_sort_nulls",
    (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio"),
          col("o_totalprice"))
        .orderBy(col("prio").asc_nulls_last, col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
    Some("""SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio, o_totalprice
      FROM orders ORDER BY prio ASC NULLS LAST, o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** TopK = SortExec.fetch → TakeOrderedAndProjectExec (slt:216-221). */
  private val topK = QueryDef(
    "q_topk",
    (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** LIMIT + OFFSET (GlobalLimitExec skip+fetch, proto:1198-1209; slt:206-243). */
  private val limitOffset = QueryDef(
    "q_limit_offset",
    (s, d) =>
      t(s, d, "customer")
        .orderBy(col("c_custkey"))
        .select(col("c_custkey"), col("c_name"))
        .offset(10)
        .limit(20),
    Some("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 10"))

  // --------------------------------------------------------------- set ops

  /** UNION ALL (UnionExec, proto:1096-1098) — partition concat, no shuffle. */
  private val unionAll = QueryDef(
    "q_union_all",
    (s, d) => {
      val n = t(s, d, "nation")
      n.filter(col("n_nationkey") < 15).select(col("n_nationkey"), col("n_name"))
        .union(n.filter(col("n_nationkey") >= 5).select(col("n_nationkey"), col("n_name")))
    },
    Some("""SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15
      UNION ALL SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 5"""))

  /** SQL UNION = union + distinct aggregate (slt:51-56, planner.rs:164-193). */
  private val unionDistinct = QueryDef(
    "q_union_distinct",
    (s, d) => {
      val n = t(s, d, "nation")
      n.filter(col("n_nationkey") < 15).select(col("n_nationkey"), col("n_name"))
        .union(n.filter(col("n_nationkey") >= 5).select(col("n_nationkey"), col("n_name")))
        .distinct()
    },
    Some("""SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15
      UNION SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 5"""))

  /** INTERSECT (logical rewrite to semi join — SURVEY §2.2 set ops). */
  private val intersectQ = QueryDef(
    "q_intersect",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 0).select(col("c_nationkey"))
        .intersect(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey")))
    },
    Some("""SELECT c_nationkey FROM customer WHERE c_acctbal > 0
      INTERSECT SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"""))

  /** EXCEPT (anti-join rewrite). */
  private val exceptQ = QueryDef(
    "q_except",
    (s, d) => {
      val c = t(s, d, "customer")
      c.select(col("c_nationkey"))
        .except(c.filter(col("c_acctbal") > 1000).select(col("c_nationkey")))
    },
    Some("""SELECT c_nationkey FROM customer
      EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal > 1000"""))

  /** INTERSECT ALL / EXCEPT ALL (multiset semantics). */
  private val intersectAll = QueryDef(
    "q_intersect_all",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 0).select(col("c_nationkey"))
        .intersectAll(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey")))
    },
    Some("""SELECT c_nationkey FROM customer WHERE c_acctbal > 0
      INTERSECT ALL SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"""))

  private val exceptAll = QueryDef(
    "q_except_all",
    (s, d) => {
      val c = t(s, d, "customer")
      c.select(col("c_nationkey"))
        .exceptAll(c.filter(col("c_acctbal") > 1000).select(col("c_nationkey")))
    },
    Some("""SELECT c_nationkey FROM customer
      EXCEPT ALL SELECT c_nationkey FROM customer WHERE c_acctbal > 1000"""))

  // ----------------------------------------------------------------- misc

  /** UnnestExec — explode a derived list column (proto:799-810). */
  private val unnestQ = QueryDef(
    "q_unnest",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word")),
    Some("SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part"))

  /** Scalar expression surface: CASE/CAST/BETWEEN/IN/LIKE/COALESCE
    * (LogicalExprNode, proto:347-406). */
  private val exprScalar = QueryDef(
    "q_expr_scalar",
    (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "mid")
          .otherwise("big").as("size_class"),
        col("p_size").between(5, 25).as("in_range"),
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3").as("top_brand"),
        col("p_name").like("%a%").as("has_a"),
        floor(col("p_retailprice")).cast(LongType).as("price_floor"),
        coalesce(nullif(col("p_type"), lit("STANDARD")), lit("(std)")).as("type_or_std")),
    Some("""SELECT p_partkey,
      CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid' ELSE 'big' END AS size_class,
      p_size BETWEEN 5 AND 25 AS in_range,
      p_brand IN ('Brand#1','Brand#2','Brand#3') AS top_brand,
      p_name LIKE '%a%' AS has_a,
      CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
      COALESCE(NULLIF(p_type, 'STANDARD'), '(std)') AS type_or_std
      FROM part"""))

  /** String function registry parity (ScalarUDFExprNode surface, proto:860-867). */
  private val funcString = QueryDef(
    "q_func_string",
    (s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).as("name_len"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("tagged"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"),
        reverse(col("c_mktsegment")).as("rseg")),
    Some("""SELECT c_custkey, UPPER(c_name) AS uname, LOWER(c_mktsegment) AS lseg,
      SUBSTRING(c_name, 1, 8) AS prefix, LENGTH(c_name) AS name_len,
      c_name || '-' || c_mktsegment AS tagged,
      REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS masked,
      LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
      REVERSE(c_mktsegment) AS rseg FROM customer"""))

  /** Math function parity. Transcendentals are *truncated* at 6 dp
    * (`floor(x*1e6)` → BIGINT): ROUND on a binary double is tie-unstable
    * across libm implementations (round-1 hash-FAIL), truncation is stable
    * because sqrt is IEEE-correctly-rounded and ln agrees to well under 1e-6
    * relative on both engines. */
  private val funcMath = QueryDef(
    "q_func_math",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          round(col("l_extendedprice"), 1).as("rounded"),
          floor(col("l_quantity")).as("fl"),
          ceil(col("l_quantity")).as("ce"),
          (col("l_orderkey") % 7).as("m7"),
          floor(sqrt(col("l_quantity")) * 1e6).as("sq"),
          floor(log(col("l_extendedprice") + 1.0) * 1e6).as("ln_p")),
    Some("""SELECT l_orderkey, l_linenumber,
      ABS(l_discount - 0.05) AS abs_d, ROUND(l_extendedprice, 1) AS rounded,
      CAST(FLOOR(l_quantity) AS BIGINT) AS fl, CAST(CEIL(l_quantity) AS BIGINT) AS ce,
      l_orderkey % 7 AS m7,
      CAST(FLOOR(SQRT(l_quantity) * 1e6) AS BIGINT) AS sq,
      CAST(FLOOR(LN(l_extendedprice + 1.0) * 1e6) AS BIGINT) AS ln_p
      FROM lineitem WHERE l_orderkey % 50 = 0"""))

  /** Date/time function parity. */
  private val funcDate = QueryDef(
    "q_func_date",
    (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus_30d"),
        last_day(col("o_orderdate")).as("month_end")),
    Some("""SELECT o_orderkey,
      EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m,
      EXTRACT(DAY FROM o_orderdate) AS dom,
      DATE_TRUNC('month', o_orderdate) AS month_start,
      o_orderdate + INTERVAL 30 DAY AS plus_30d,
      LAST_DAY(o_orderdate) AS month_end FROM orders"""))

  /** Array-function surface (SURVEY §2.2 scalar-expression note: "all
    * scalar functions as named UDFs … array/map/json"): build, index,
    * search, sort, slice, dedup. Array outputs are stringified
    * (concat_ws) so the hash compare sees identical scalars on both
    * engines; element ordering parity holds because both sort strings in
    * binary order (corpus is ASCII). */
  private val funcArray = QueryDef(
    "q_func_array",
    (s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_toks"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_contains(col("toks"), "the").as("has_the"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          concat_ws("|", slice(sort_array(col("toks")), 1, 3)).as("sorted_head"),
          coalesce(array_position(col("toks"), "the"), lit(0L)).as("the_pos")),
    Some("""SELECT doc_id,
        len(toks) AS n_toks, toks[1] AS first_tok, toks[-1] AS last_tok,
        list_contains(toks, 'the') AS has_the,
        len(list_distinct(toks)) AS n_distinct,
        array_to_string(list_sort(toks)[1:3], '|') AS sorted_head,
        CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS the_pos
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"""))

  /** Map-function surface: construct, key/value projection, lookup.
    * DuckDB's map extraction returns a single-element list, hence the
    * trailing [1]; Spark's element_at returns the value directly. */
  private val funcMap = QueryDef(
    "q_func_map",
    (s, d) =>
      t(s, d, "lineitem")
        .withColumn("m", map_from_arrays(
          array(lit("qty"), lit("line")),
          array(col("l_quantity").cast("long"), col("l_linenumber").cast("long"))))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          element_at(col("m"), "qty").as("qty_val"),
          concat_ws(",", map_keys(col("m"))).as("keys"),
          element_at(map_values(col("m")), 2).as("second_val")),
    Some("""SELECT l_orderkey, l_linenumber,
        m['qty'][1] AS qty_val,
        array_to_string(map_keys(m), ',') AS keys,
        map_values(m)[2] AS second_val
      FROM (SELECT l_orderkey, l_linenumber,
              map(['qty','line'],
                  [CAST(l_quantity AS BIGINT), CAST(l_linenumber AS BIGINT)]) AS m
            FROM lineitem)"""))

  /** JSON-function surface over the `events.props` JSON column: extract +
    * cast, re-serialize (both engines emit compact JSON), and aggregate on
    * extracted values. */
  private val funcJson = QueryDef(
    "q_func_json",
    (s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .select(col("event_type"), col("k"),
          to_json(struct(col("event_id"), col("k"))).as("rebuilt"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          count(col("k")).as("n_k"),
          max(length(col("rebuilt"))).as("max_json_len")),
    Some("""SELECT event_type,
        CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k,
        CAST(MAX(length(rebuilt)) AS BIGINT) AS max_json_len
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
              to_json(struct_pack(event_id := event_id,
                k := CAST(json_extract_string(props, '$.k') AS BIGINT)))::VARCHAR AS rebuilt
            FROM events)
      GROUP BY event_type"""))

  // -------------------------------------------------------------- subquery

  /** Uncorrelated scalar subquery (exact-decimal avg → stable threshold). */
  private val subqueryScalar = QueryDef(
    "q_subquery_scalar",
    (s, d) => {
      Tables.register(s, d, "orders")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)""")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)"""))

  /** IN subquery (decorrelated to semi join by Catalyst). */
  private val subqueryIn = QueryDef(
    "q_subquery_in",
    (s, d) => {
      Tables.register(s, d, "nation", "region")
      s.sql("""SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN
        (SELECT r_regionkey FROM region WHERE r_name LIKE '%A%')""")
    },
    Some("""SELECT n_nationkey, n_name FROM nation WHERE n_regionkey IN
      (SELECT r_regionkey FROM region WHERE r_name LIKE '%A%')"""))

  /** NOT IN over a NULLABLE key — three-valued-logic anti join. A plain
    * left anti is wrong here (x NOT IN (...NULL...) is never true), so
    * Catalyst plans a null-aware anti join instead (plan-asserted in
    * PlanSpec). The nullif never actually fires, but its nullable TYPE is
    * what forces the planner onto the null-aware path. */
  private val subqueryNotIn = QueryDef(
    "q_subquery_not_in",
    (s, d) => {
      Tables.register(s, d, "customer", "nation")
      s.sql("""SELECT c_custkey, c_nationkey FROM customer
        WHERE c_nationkey NOT IN
          (SELECT nullif(n_nationkey, -1) FROM nation WHERE n_regionkey >= 3)""")
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer
      WHERE c_nationkey NOT IN
        (SELECT nullif(n_nationkey, -1) FROM nation WHERE n_regionkey >= 3)"""))

  /** Correlated EXISTS (MARK-join surface → Catalyst ExistenceJoin). */
  private val subqueryExists = QueryDef(
    "q_subquery_exists",
    (s, d) => {
      Tables.register(s, d, "supplier", "lineitem")
      s.sql("""SELECT s_suppkey, s_name FROM supplier WHERE EXISTS
        (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45)""")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier WHERE EXISTS
      (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45)"""))

  /** EXISTS under a disjunction — the shape that genuinely exercises
    * Catalyst's ExistenceJoin (the reference's MARK join,
    * `datafusion_common.proto:84-90`): a plain EXISTS rewrites to a
    * LeftSemi join, but OR-ed with another predicate the subquery must
    * produce a boolean *mark* column instead of filtering — exactly MARK
    * semantics. Plan-asserted in PlanSpec. */
  private val subqueryExistsOr = QueryDef(
    "q_subquery_exists_or",
    (s, d) => {
      Tables.register(s, d, "supplier", "lineitem")
      s.sql("""SELECT s_suppkey, s_name FROM supplier
        WHERE s_acctbal > 9000 OR EXISTS
          (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49)""")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE s_acctbal > 9000 OR EXISTS
        (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49)"""))

  /** Correlated scalar subquery (decorrelation surface distinct from the
    * uncorrelated [[subqueryScalar]]): per-order max picked via a
    * correlated aggregate — Catalyst rewrites to aggregate + join. */
  private val subqueryCorrelated = QueryDef(
    "q_subquery_correlated",
    (s, d) => {
      Tables.register(s, d, "lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l1
        WHERE l_quantity = (SELECT MAX(l_quantity) FROM lineitem l2
                            WHERE l2.l_orderkey = l1.l_orderkey)""")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l1
      WHERE l_quantity = (SELECT MAX(l_quantity) FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey)"""))

  val all: Seq[QueryDef] = Seq(
    scanProject, filterComplex, selectOne, emptyRel, genSeries,
    joinInner, joinBroadcast, joinLeft, joinRight, joinFull, joinSemi,
    joinAnti, joinCross, joinTheta, joinNullSafe,
    q1Agg, aggGlobal, aggHaving, distinctRows, aggCountDistinct, aggFilter,
    aggRollup, aggCube, aggGroupingSets, aggNullKeys, aggPercentile, aggStringAgg,
    windowRank, windowRanks, windowRunning, windowRange, windowGroups, windowLeadLag,
    windowValueFns,
    sortNulls, topK, limitOffset,
    unionAll, unionDistinct, intersectQ, exceptQ, intersectAll, exceptAll,
    unnestQ, exprScalar, funcString, funcMath, funcDate,
    funcArray, funcMap, funcJson,
    subqueryScalar, subqueryIn, subqueryNotIn, subqueryExists, subqueryExistsOr,
    subqueryCorrelated)
}
