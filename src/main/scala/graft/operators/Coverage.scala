package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage for the SURVEY.md §2 rows a round-1 query didn't exercise
  * (VERDICT.md "Next round" #9): explicit repartition/coalesce shapes,
  * per-partition sort, struct unnest, EXPLAIN, regex predicates, in-memory
  * scans, and placeholder parameters.
  */
object Coverage {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.t(s, d, n)

  /** RepartitionExec hash mode (proto:1250-1266; planner.rs:127-130): an
    * explicit hash exchange on the grouping key. Because the data is then
    * already hash-distributed on `c_nationkey`, the downstream aggregation
    * needs no second shuffle — the same co-partitioning trick that lets a
    * 100 TB pipeline reuse one exchange across stages. */
  private val repartitionHash = QueryDef(
    "q_repartition_hash",
    (s, d) =>
      t(s, d, "customer")
        .repartition(8, col("c_nationkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n")),
    Some("SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey"))

  /** RepartitionExec round-robin mode + CoalescePartitionsExec
    * (proto:1240-1258): scatter to 16 then coalesce to 4 — the classic
    * rebalance-after-skewed-filter shape; the global agg proves the row set
    * is preserved. */
  private val repartitionRoundRobin = QueryDef(
    "q_repartition_roundrobin",
    (s, d) =>
      t(s, d, "orders")
        .filter(col("o_totalprice") > 50000)
        .repartition(16)
        .coalesce(4)
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key")),
    Some("""SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key
      FROM orders WHERE o_totalprice > 50000"""))

  /** SortExec preserve_partitioning=true (proto:1211-1217): hash exchange +
    * per-partition sort, no global merge — the write-side layout op for
    * sorted parquet/bucketed output at scale. Output hash is row-order
    * insensitive, so the oracle is the plain projection.
    *
    * Buckets on `l_orderkey` (r15; was `l_returnflag`): a 3-distinct-value
    * hash key collapses every row into ≤3 of the 8 partitions, so the
    * per-partition sorts run on 3 cores over ~N/3 rows each — the sf1
    * decade ratio read 6.4x isolated (0.62 → 4.0 s) with GC flat and zero
    * disk reads, i.e. pure serial-sort loss, and at 100 TB the same key
    * choice would put ~33 TB on one task. Bucketing on the high-cardinality
    * natural key is the layout a real sorted/bucketed writer uses; the
    * exchange + in-partition sort shape under test is unchanged. */
  private val sortWithinPartitions = QueryDef(
    "q_sort_within_partitions",
    (s, d) =>
      t(s, d, "lineitem")
        .repartition(8, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber")),
    Some("SELECT l_returnflag, l_orderkey, l_linenumber FROM lineitem"))

  /** Struct unnest (UnnestOptions struct fields, proto:799-810): build a
    * struct, expand with `.*`, plus `inline()` over an array-of-struct (the
    * Generator form). Oracle = the equivalent UNION ALL. */
  private val unnestStruct = QueryDef(
    "q_unnest_struct",
    (s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          expr("inline(array(" +
            "named_struct('tag', p_brand, 'v', cast(p_size as bigint)), " +
            "named_struct('tag', p_type, 'v', cast(floor(p_retailprice) as bigint))))")),
    Some("""SELECT p_partkey, p_brand AS tag, CAST(p_size AS BIGINT) AS v FROM part
      UNION ALL
      SELECT p_partkey, p_type AS tag, CAST(FLOOR(p_retailprice) AS BIGINT) AS v FROM part"""))

  /** ExplainExec (proto:1100-1111): EXPLAIN as a queryable relation. The
    * plan text is engine-specific, so this is a rows-only entry (no oracle),
    * like the reference's own EXPLAIN output. */
  private val explainQ = QueryDef(
    "q_explain",
    (s, d) => {
      Tables.register(s, d, "lineitem")
      s.sql("EXPLAIN FORMATTED SELECT l_returnflag, count(*) FROM lineitem " +
        "WHERE l_quantity > 10 GROUP BY l_returnflag")
    },
    None)

  /** AnalyzeExec (proto:1100-1111, EXPLAIN ANALYZE): execute the query,
    * then surface the *runtime* operator metrics as a queryable relation.
    * Plan text is engine-specific, but runtime row counts are not — the
    * oracle recomputes the filter's true selectivity, so this checks that
    * the executed plan's instrumentation reports reality (the part of
    * EXPLAIN ANALYZE that actually matters). */
  private val explainAnalyze = QueryDef(
    "q_explain_analyze",
    (s, d) => {
      import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val df = t(s, d, "lineitem").filter(col("l_quantity") > 10)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val result = df.collect() // ANALYZE = run it; metrics populate on execution
      // AQE wraps completed stages in leaf QueryStageExec nodes, so a plain
      // collect() never sees inside them — descend explicitly.
      def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => flatten(q.plan)
        case other => other.children.flatMap(flatten)
      })
      val filterRows = flatten(df.queryExecution.executedPlan).collect {
        case f: FilterExec => f.metrics("numOutputRows").value
      }.max
      val groups = result.length.toLong // from the run whose metrics we read
      import s.implicits._
      Seq(("filter_output_rows", filterRows), ("result_groups", groups))
        .toDF("metric", "rows")
    },
    Some("""SELECT 'filter_output_rows' AS metric, count(*) AS rows
        FROM lineitem WHERE l_quantity > 10
      UNION ALL
      SELECT 'result_groups', count(DISTINCT l_returnflag)
        FROM lineitem WHERE l_quantity > 10"""))

  /** GenerateSeriesNode's date/timestamp range form (proto:1346-1356 lists
    * int64, timestamp, and date ranges; q_generate_series covers int64):
    * `sequence(date, date, interval)` + explode. */
  private val generateSeriesDate = QueryDef(
    "q_generate_series_date",
    (s, _) =>
      s.range(1).select(explode(expr(
        "sequence(DATE'1995-01-01', DATE'1995-03-01', INTERVAL 1 WEEK)")).as("d"))
        .select(col("d"), year(col("d")).as("y"), weekofyear(col("d")).as("w")),
    Some("""SELECT CAST(generate_series AS DATE) AS d,
        EXTRACT(YEAR FROM generate_series) AS y,
        EXTRACT(WEEK FROM generate_series) AS w
      FROM generate_series(DATE '1995-01-01', DATE '1995-03-01', INTERVAL 1 WEEK)"""))

  /** PIVOT: orders per year x status as a wide relation. Counts (exact
    * ints) rather than double sums keep cross-engine parity trivial;
    * na.fill(0) aligns Spark's null-for-missing-combo with COUNT's 0. */
  private val pivotQ = QueryDef(
    "q_pivot",
    (s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L),
    Some("""SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
        CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
      FROM orders GROUP BY 1"""))

  /** UNPIVOT/melt: wide metric columns back to (id, metric, value) rows —
    * the inverse reshape, raw values so no arithmetic parity risk. */
  private val unpivotQ = QueryDef(
    "q_unpivot",
    (s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value"),
    Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem"""))

  /** Custom aggregate through the typed `Aggregator` + `udaf()` API — the
    * Spark registration path for what the reference ships as named UDAFs
    * over the wire (proto:513, 869-879): weighted mean of quantity by line
    * number per return flag. Exact Long buffer sums make the result
    * independent of partial-aggregation merge order. */
  private val customUdaf = QueryDef(
    "q_agg_custom_udaf",
    (s, d) => {
      // Sessions registers graft_wmean once per session; the existence
      // check keeps THIS query self-contained on any session (an embedder
      // building its own SparkSession must not fail at analysis) without
      // the per-build re-registration warning a bare register() spams.
      if (!s.catalog.functionExists("graft_wmean"))
        s.udf.register("graft_wmean",
          org.apache.spark.sql.functions.udaf(graft.functions.WeightedMean))
      t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("v"),
          col("l_linenumber").cast("long").as("w"))
        .groupBy(col("l_returnflag"))
        .agg(expr("graft_wmean(v, w)").as("wmean_qty"))
    },
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS DOUBLE)
          / CAST(SUM(CAST(l_linenumber AS BIGINT)) AS DOUBLE) AS wmean_qty
      FROM lineitem GROUP BY l_returnflag"""))

  /** SIMILAR TO / regex predicate surface (proto:356): `rlike` filter +
    * `regexp_extract` projection. */
  private val regexMatch = QueryDef(
    "q_regex_match",
    (s, d) =>
      t(s, d, "customer")
        .filter(col("c_name").rlike("[0-9]{2}$"))
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("name_num")),
    Some("""SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS name_num
      FROM customer WHERE regexp_matches(c_name, '[0-9]{2}$')"""))

  /** MemoryScanExecNode (proto:1045-1052): a driver-local in-memory relation
    * (LocalTableScan) broadcast-joined against a parquet dim — the
    * reference's MemTable pattern (integration-tests/src/data.rs:36-92).
    * Small local data stays on the driver; only the 5-row literal ships. */
  private val memoryScan = QueryDef(
    "q_memory_scan",
    (s, d) => {
      val mem = s.createDataFrame(Seq((0, "priority-zone"), (2, "priority-zone"),
        (3, "watch-zone"))).toDF("rk", "zone")
      mem.join(broadcast(t(s, d, "region")), col("rk") === col("r_regionkey"))
        .select(col("rk"), col("zone"), col("r_name"))
    },
    Some("""SELECT rk, zone, r_name
      FROM (VALUES (0, 'priority-zone'), (2, 'priority-zone'), (3, 'watch-zone')) m(rk, zone)
      JOIN region ON rk = r_regionkey"""))

  /** Placeholder parameters (`$1`, proto:381): Spark named (`:name`) AND
    * positional (`?`) parameter markers — both bind literals at parse
    * time, so pushdown still sees constants. */
  private val paramQuery = QueryDef(
    "q_param",
    (s, d) => {
      Tables.register(s, d, "orders")
      val named = s.sql(
        "SELECT o_orderkey, o_totalprice FROM orders " +
          "WHERE o_totalprice > :threshold ORDER BY o_orderkey LIMIT 50",
        Map("threshold" -> 300000))
      val positional = s.sql(
        "SELECT o_orderkey, o_totalprice FROM orders " +
          "WHERE o_totalprice > ? ORDER BY o_orderkey LIMIT 50",
        Array(300000.asInstanceOf[AnyRef]))
      named.unionAll(positional)
    },
    Some("""WITH p AS (SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 300000 ORDER BY o_orderkey LIMIT 50)
      SELECT * FROM p UNION ALL SELECT * FROM p"""))

  /** Remaining scalar-expression surface (proto:347-406): IS [NOT]
    * TRUE/FALSE/UNKNOWN three-valued predicates, TRY_CAST, ILIKE. */
  private val exprBool = QueryDef(
    "q_expr_bool",
    (s, d) => {
      Tables.register(s, d, "customer")
      s.sql("""SELECT c_custkey,
        (c_acctbal > 5000) IS TRUE AS rich,
        (nullif(c_nationkey, c_nationkey) = 0) IS UNKNOWN AS unk,
        (c_mktsegment = 'BUILDING') IS NOT FALSE AS maybe_building,
        TRY_CAST(substr(c_name, 1, 3) AS INT) AS bad_cast,
        TRY_CAST(c_custkey AS STRING) AS ok_cast,
        c_mktsegment ILIKE 'bUiLd%' AS ilike_hit
        FROM customer""")
    },
    Some("""SELECT c_custkey,
      (c_acctbal > 5000) IS TRUE AS rich,
      (nullif(c_nationkey, c_nationkey) = 0) IS UNKNOWN AS unk,
      (c_mktsegment = 'BUILDING') IS NOT FALSE AS maybe_building,
      TRY_CAST(substr(c_name, 1, 3) AS INT) AS bad_cast,
      TRY_CAST(c_custkey AS VARCHAR) AS ok_cast,
      c_mktsegment ILIKE 'bUiLd%' AS ilike_hit
      FROM customer"""))

  /** Data-quality audit: the constraint-check relation a pipeline gates a
    * release on (dbt-test style) — PK duplicates, null keys, range
    * violations from ONE conditional-aggregate scan (stack() reshapes the
    * single row to (check, value)), plus an FK-orphan count as a broadcast
    * anti join. All counts exact BIGINT; at 100 TB this is one fact scan +
    * one dimension broadcast, no data-sized shuffle. */
  private val dqAudit = QueryDef(
    "q_dq_audit",
    (s, d) => {
      val o = t(s, d, "orders")
      val scanChecks = o.agg(
        count(lit(1)).as("row_count"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dups"),
        count(when(col("o_custkey").isNull, lit(1))).as("null_custkey"),
        count(when(col("o_totalprice") <= 0, lit(1))).as("nonpositive_total"),
        count(when(col("o_orderdate") < lit("1990-01-01") ||
          col("o_orderdate") >= lit("2010-01-01"), lit(1))).as("date_out_of_range"))
        .select(expr("""stack(5,
          'row_count', row_count,
          'pk_dups', pk_dups,
          'null_custkey', null_custkey,
          'nonpositive_total', nonpositive_total,
          'date_out_of_range', date_out_of_range) AS (check_name, value)"""))
      val orphans = o
        .join(broadcast(t(s, d, "customer").select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("value"))
        .select(lit("fk_orphan_orders").as("check_name"), col("value"))
      scanChecks.unionAll(orphans)
    },
    Some("""SELECT 'row_count' AS check_name, CAST(COUNT(*) AS BIGINT) AS value FROM orders
      UNION ALL SELECT 'pk_dups', CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
      UNION ALL SELECT 'null_custkey', CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
      UNION ALL SELECT 'nonpositive_total', CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
      UNION ALL SELECT 'date_out_of_range', CAST(COUNT(*) FILTER (WHERE o_orderdate < DATE '1990-01-01' OR o_orderdate >= DATE '2010-01-01') AS BIGINT) FROM orders
      UNION ALL SELECT 'fk_orphan_orders', CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)"""))

  /** Top-k per group, written as the standard window idiom — which the
    * injected WindowTopKRewrite turns into the custom TopKPerGroupExec
    * (bounded per-group heaps, partial before the shuffle, no sort): the
    * declarative query stays the source of truth, the engine swaps in the
    * cheaper operator (plan-asserted in PlansSpec; the oracle runs the
    * untouched window SQL). Total order (acctbal DESC, custkey) makes the
    * result deterministic. */
  private val topkPerGroup = QueryDef(
    "q_topk_per_group",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    },
    Some("""SELECT c_custkey, c_nationkey, c_acctbal FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey) AS rk
        FROM customer) ranked
      WHERE rk <= 3"""))

  val all: Seq[QueryDef] = Seq(repartitionHash, repartitionRoundRobin,
    sortWithinPartitions, unnestStruct, explainQ, explainAnalyze, regexMatch,
    memoryScan, paramQuery, exprBool, customUdaf,
    generateSeriesDate, pivotQ, unpivotQ, dqAudit, topkPerGroup)
}
