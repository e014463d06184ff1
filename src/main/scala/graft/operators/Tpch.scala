package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full TPC-H-shaped composite queries (adapted to the synthetic schema —
  * no part/partsupp columns in some cases, `l_shipdate` is a timestamp).
  * These are the realistic multi-join analytics workloads the relational
  * surface exists for; each plan is the one you'd want at 100 TB: dims
  * broadcast, facts shuffle once on their join key, aggregates are
  * partial/final, top-k is TakeOrderedAndProject — audited in PlanSpec.
  *
  * Money math follows the oracle-parity conventions (decimal operands,
  * DSUM/DREV from Relational).
  */
object Tpch {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.t(s, d, n)

  private def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2))))
      .cast(DoubleType)
  private val DREV = "CAST(SUM(CAST(%s AS DECIMAL(18,2)) * " +
    "(CAST(1 AS DECIMAL(18,2)) - CAST(%s AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Q3 shape: shipping-priority — segment-filtered customer ⋈ orders ⋈
    * lineitem, revenue per order, top 10. customer is the small side
    * (broadcast); orders/lineitem co-shuffle on o_orderkey. */
  private val q3 = QueryDef(
    "q_tpch_q3",
    (s, d) => {
      val cutoff = to_timestamp(lit("1995-03-15"))
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, ${DREV.format("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1995-03-15'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Q5 shape: local-supplier revenue per nation — the 5-way join.
    * nation/region broadcast; customer/orders/lineitem/supplier shuffle;
    * the c_nationkey = s_nationkey "local supplier" condition rides the
    * join. */
  private val q5 = QueryDef(
    "q_tpch_q5",
    (s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n = broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey")))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },
    Some(s"""SELECT n_name, ${DREV.format("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      GROUP BY n_name"""))

  /** Q10 shape: returned-item reporting — revenue lost to returns per
    * customer, top 20. */
  private val q10 = QueryDef(
    "q_tpch_q10",
    (s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val n = broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name")))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        ${DREV.format("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Q18 shape: large-volume orders — aggregate the fact table first
    * (partial agg + HAVING carries only qualifying order keys out of the
    * shuffle), then enrich the survivors with orders/customer. The
    * pre-aggregate-then-join order is the 100 TB-critical choice: joining
    * first would shuffle every lineitem row against orders; aggregating
    * first shrinks the fact stream to |qualifying orders| before any join.
    * l_quantity is integral, so the sum is cast to BIGINT — exact in any
    * summation order, no float-parity risk. */
  private val q18 = QueryDef(
    "q_tpch_q18",
    (s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 200)
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 200) big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** Q4 shape: order-priority checking — orders with at least one
    * late-shipped lineitem (l_shipdate > o_orderdate stands in for the
    * reference schema's commitdate/receiptdate pair), counted per
    * priority. The EXISTS becomes a LEFT SEMI join: both sides shuffle
    * once on the order key, the semi join emits each order at most once
    * (no post-join dedup), and the count aggregate is partial/final. */
  private val q4 = QueryDef(
    "q_tpch_q4",
    (s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01") &&
          col("o_orderdate") < lit("1996-10-01"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val l = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority"""))

  /** Q7 shape: volume shipping between two nations, per direction per
    * year. Both nation lookups broadcast; the fact chain
    * lineitem ⋈ orders ⋈ customer shuffles on the order key and
    * lineitem ⋈ supplier on the supplier key — the nation-pair filter
    * rides the broadcast joins, never a shuffle of its own. */
  private val q7 = QueryDef(
    "q_tpch_q7",
    (s, d) => {
      // A 4-nation bloc instead of the classic 2: sf0.001 has only 10
      // suppliers spread over 10 nations, and a single pair can be empty
      // there; the bloc keeps the per-direction pair semantics with rows
      // at every scale.
      val bloc = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"),
          year(col("l_shipdate")).as("l_year"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n1 = broadcast(t(s, d, "nation")
        .filter(col("n_name").isin(bloc: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .filter(col("n_name").isin(bloc: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n1, sup("s_nationkey") === col("n1_key"))
        .join(n2, c("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },
    Some(s"""SELECT supp_nation, cust_nation, l_year,
        ${DREV.format("l_extendedprice", "l_discount")} AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INTEGER) AS l_year,
          l_extendedprice, l_discount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
          AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
          AND n1.n_name <> n2.n_name
          AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01')
      GROUP BY supp_nation, cust_nation, l_year"""))

  /** Q14 shape: promo-revenue split — a conditional aggregate over one
    * broadcast-enriched fact scan. Emits the exact decimal numerator and
    * denominator rather than their ratio: the division would round twice
    * (once per engine, in different modes), while the sums stay exact.
    * The CASE has no ELSE, so non-promo rows contribute NULL (ignored by
    * SUM) identically on both engines. */
  private val q14 = QueryDef(
    "q_tpch_q14",
    (s, d) => {
      val p = broadcast(t(s, d, "part").select(col("p_partkey"), col("p_type")))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val dec = col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2)))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", dec)).cast(DoubleType).as("promo_revenue"),
          sum(dec).cast(DoubleType).as("total_revenue"))
    },
    Some(s"""SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END)
          AS DOUBLE) AS promo_revenue,
        ${DREV.format("l_extendedprice", "l_discount")} AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'"""))

  /** Q17 shape: small-quantity-order revenue for one brand. The
    * correlated per-part average becomes a PARTITIONED WINDOW over the
    * part key (the q2 trick): ONE pass over lineitem — the broadcast
    * brand filter shrinks the stream first (sound because the per-part
    * average is over rows of the same part, and the brand predicate keeps
    * or drops a part's rows wholesale), then avg-over-part rides the
    * single part-key shuffle. The aggregate-then-join form would scan the
    * fact twice. The threshold expression (0.2 * exact-BIGINT sum /
    * count, one IEEE op per step) is evaluated in the same order on both
    * engines, so the filter is bit-stable. */
  private val q17 = QueryDef(
    "q_tpch_q17",
    (s, d) => {
      val p = broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey")))
      val l = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .withColumn("qty_limit",
          lit(0.2) * (sum(col("l_quantity").cast(LongType)).over(w).cast(DoubleType) /
            count(lit(1)).over(w)))
        .filter(col("l_quantity") < col("qty_limit"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType) / lit(7.0)).as("avg_yearly"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN (SELECT l_partkey AS t_partkey,
              0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
                AS qty_limit
            FROM lineitem GROUP BY 1) t ON l_partkey = t_partkey
      WHERE p_brand = 'Brand#13' AND l_quantity < qty_limit"""))

  /** Q21 shape: suppliers who alone shipped late on a multi-supplier
    * order ("kept the order waiting"). The classic double-EXISTS
    * decorrelates into one per-order aggregate — distinct suppliers and
    * distinct *late* suppliers — joined back to the late lineitems; at
    * scale that is one orderkey shuffle plus a broadcast of the supplier
    * dimension, instead of two correlated probes per row. Lateness =
    * shipped more than 45 days after the order date (this schema has no
    * commit/receipt dates). The oracle keeps the textbook EXISTS / NOT
    * EXISTS form, so the gate also proves the rewrite's equivalence. */
  private val q21 = QueryDef(
    "q_tpch_q21",
    (s, d) => {
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS")
      val l = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late", late)
      // Two-level aggregation, ONE pass over the fact join: per-(order,
      // supplier) late-line counts first (map-side partials collapse a
      // supplier's repeated lineitems; the order-key partitioning from the
      // join already clusters both group levels, so neither re-shuffles),
      // then per-order supplier counts carry the lone late supplier's key
      // and its late-line total forward — the late lineitems never join
      // back. Equivalent to two countDistincts but with no Expand and no
      // second fact pass.
      val perOrder = l
        .groupBy(col("l_orderkey").as("g_orderkey"), col("l_suppkey").as("g_suppkey"))
        .agg(count(when(col("is_late"), lit(1))).as("late_lines"))
        .groupBy(col("g_orderkey"))
        .agg(count(lit(1)).as("n_supps"),
          count(when(col("late_lines") > 0, lit(1))).as("n_late_supps"),
          max(when(col("late_lines") > 0, col("g_suppkey"))).as("late_suppkey"),
          sum(when(col("late_lines") > 0, col("late_lines"))).as("late_line_cnt"))
      val sup = broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_name")))
      perOrder
        .filter(col("n_supps") > 1 && col("n_late_supps") === 1)
        .join(sup, col("late_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("late_line_cnt")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM lineitem l1
      JOIN orders ON l1.l_orderkey = o_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 100"""))

  /** Q6 shape: forecasting-revenue — the pure scan-aggregate. Everything
    * must reach the parquet scan as pushed filters (asserted in PlanSpec
    * for the scan family); the aggregate is exact decimal on operands. */
  private val q6 = QueryDef(
    "q_tpch_q6",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Q19 shape: discounted-revenue under a disjunction of (brand, size,
    * quantity) bands — the boolean-pushdown stress: the OR-of-ANDs rides
    * the broadcast join as one residual predicate, and the common
    * quantity envelope still prunes at the scan. */
  private val q19 = QueryDef(
    "q_tpch_q19",
    (s, d) => {
      val p = broadcast(t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      val l = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val bands =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#10" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(bands)
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },
    Some(s"""SELECT ${DREV.format("l_extendedprice", "l_discount")} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""))

  /** Q22 shape: global-sales-opportunity — customers in a bucket set with
    * above-average balance and NO orders. The scalar average is computed
    * once (exact decimal sum, single IEEE division) and rides a
    * broadcast; the "never ordered" test is a LEFT ANTI join on the
    * customer key against URGENT orders (this corpus gives every
    * customer ~10 orders, so the bare no-orders set is empty at every
    * sf; no-urgent-orders keeps Q22's anti-join semantics with rows).
    * No phone column either, so the "country code" is c_nationkey % 10. */
  private val q22 = QueryDef(
    "q_tpch_q22",
    (s, d) => {
      val bucketed = t(s, d, "customer")
        .withColumn("cc", col("c_nationkey") % 10)
        .filter(col("cc").isin(1, 2, 3) && col("c_acctbal") > 0)
      val threshold = bucketed
        .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1))).as("avg_bal"))
      val o = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      bucketed.crossJoin(broadcast(threshold))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cc"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("totacctbal"))
    },
    Some("""WITH bucketed AS (
        SELECT c_custkey, c_nationkey % 10 AS cc, c_acctbal FROM customer
        WHERE c_nationkey % 10 IN (1, 2, 3) AND c_acctbal > 0),
      thr AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          AS avg_bal FROM bucketed)
      SELECT cc, CAST(count(*) AS BIGINT) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM bucketed, thr
      WHERE c_acctbal > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY cc"""))

  /** Q8 shape: national market share — one nation's revenue share of a
    * part-type market inside one region, per order year. Five dimension
    * broadcasts around a single fact chain (lineitem shuffles once per
    * equi key); the share is emitted as exact decimal numerator +
    * denominator (the Q14 convention — a ratio would round differently
    * per engine). */
  private val q8 = QueryDef(
    "q_tpch_q8",
    (s, d) => {
      val p = broadcast(t(s, d, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey")))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_regionkey")))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey")))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val dec = col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2)))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n2, c("c_nationkey") === col("n2_key"))
        .join(r, col("n_regionkey") === r("r_regionkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n1, sup("s_nationkey") === col("n1_key"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", dec)).cast(DoubleType)
            .as("nation_revenue"),
          sum(dec).cast(DoubleType).as("total_revenue"))
    },
    Some(s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END)
          AS DOUBLE) AS nation_revenue,
        ${DREV.format("l_extendedprice", "l_discount")} AS total_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
      GROUP BY 1"""))

  /** Q12 shape: shipping-priority audit — per lateness band (this schema
    * has no shipmode; shipped >45 days after ordering stands in), how
    * many lineitems belong to critical- vs normal-priority orders. One
    * fact shuffle, conditional integer counts (exact on both engines). */
  private val q12 = QueryDef(
    "q_tpch_q12",
    (s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"))
      val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("late_band",
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"),
            "late").otherwise("ontime"))
        .groupBy(col("late_band"))
        .agg(
          sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!critical, 1L).otherwise(0L)).as("low_line_count"))
    },
    Some("""SELECT
        CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
          THEN 'late' ELSE 'ontime' END AS late_band,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1"""))

  /** Q2 shape: minimum-cost supplier. This schema has no partsupp, so the
    * supply catalog is derived: per (part, supplier) pair the offered cost
    * is MIN(l_extendedprice) over that pair's lineitems (exact double MIN —
    * no arithmetic, no parity risk). The classic correlated MIN subquery
    * decorrelates to aggregate-then-join: the catalog aggregates once on
    * (part, supplier), regional suppliers ride a broadcast, the per-part
    * minimum re-aggregates on the part key, and the equality join back is
    * co-partitioned on that same key — two fact shuffles total, both on
    * keys the plan already needs. */
  private val q2 = QueryDef(
    "q_tpch_q2",
    (s, d) => {
      val n = broadcast(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey")))
      val regional = broadcast(t(s, d, "supplier")
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
      val p = broadcast(t(s, d, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 20))
        .select(col("p_partkey")))
      // r17 (guide §3.2: reduce the big side BEFORE shuffling it): the
      // part and regional-supplier dimension filters are per-(part, supp)
      // predicates, and MIN over a pair's lineitems is a per-pair
      // aggregate — so broadcast-semi-joining the fact against both
      // filtered dimensions BEFORE the (part, supp) exchange drops every
      // never-qualifying row from the catalog aggregation's shuffle
      // (previously both filters applied only after it). Pairs removed
      // here are exactly the pairs the post-agg joins discarded.
      val catalog = t(s, d, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(regional.select(col("s_suppkey").as("rs_suppkey"))),
          col("l_suppkey") === col("rs_suppkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("supply_cost"))
      // Part filter BEFORE the per-part minimum: it restricts which parts,
      // never which suppliers, so the minimum is unchanged — and the window
      // input shrinks to qualifying parts only. The window (bounded by
      // |suppliers per part|) replaces a second catalog aggregation + self
      // join: the catalog subtree is computed exactly once.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      catalog.join(regional, col("l_suppkey") === col("s_suppkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("min_cost", min(col("supply_cost")).over(w))
        .filter(col("supply_cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""WITH catalog AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
        FROM lineitem GROUP BY 1, 2),
      regional AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'),
      cat_r AS (
        SELECT c.l_partkey, c.supply_cost, r.s_name, r.s_acctbal, r.n_name
        FROM catalog c JOIN regional r ON c.l_suppkey = r.s_suppkey)
      SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
      FROM cat_r JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        AND supply_cost = (SELECT MIN(c2.supply_cost) FROM cat_r c2
                           WHERE c2.l_partkey = cat_r.l_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""))

  /** Q9 shape: product-type profit by nation and year. Supply cost stands
    * in as 60% of p_retailprice (no partsupp). Every term is exact
    * decimal — (18,2)x(18,2) for the revenue leg, (8,2)x(2,1)x(3,0) for
    * the cost leg (quantity is integral 1..50) — so the SUM is exact and
    * its final DOUBLE cast is bit-identical on both engines. Plan: part
    * and nation broadcast; lineitem shuffles once on the order key and
    * once on the supplier key. */
  private val q9 = QueryDef(
    "q_tpch_q9",
    (s, d) => {
      val p = broadcast(t(s, d, "part").filter(col("p_name").endsWith("bolt"))
        .select(col("p_partkey"), col("p_retailprice")))
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n = broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name")))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val amount = col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))) -
        col("p_retailprice").cast(DecimalType(8, 2)) *
          lit(0.6).cast(DecimalType(2, 1)) * col("l_quantity").cast(DecimalType(3, 0))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(amount).cast(DoubleType).as("sum_profit"))
    },
    Some("""SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          - CAST(p_retailprice AS DECIMAL(8,2)) * CAST(0.6 AS DECIMAL(2,1)) *
            CAST(l_quantity AS DECIMAL(3,0))) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt'
      GROUP BY 1, 2"""))

  /** Q11 shape: important stock. Part "inventory value" stands in as the
    * revenue shipped by suppliers of one region (no partsupp); a part
    * qualifies when its value exceeds 0.1% of the regional total. The
    * scalar total rides a one-row broadcast (the Q22 pattern); the value
    * comparison is done in double on BOTH engines (exact decimal sums
    * cast once — multiplying the DECIMAL(38,4) total by a fraction would
    * overflow decimal width on either engine). */
  private val q11 = QueryDef(
    "q_tpch_q11",
    (s, d) => {
      val n = broadcast(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_regionkey")))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")
        .select(col("r_regionkey")))
      val regional = broadcast(t(s, d, "supplier")
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey")))
      val perPart = t(s, d, "lineitem")
        .join(regional, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("part_value"))
      val total = perPart.agg(sum(col("part_value")).as("total_value"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_value") * lit(1000.0) > col("total_value"))
        .select(col("l_partkey"), col("part_value"))
    },
    Some(s"""WITH regional AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      per_part AS (
        SELECT l_partkey, ${DREV.format("l_extendedprice", "l_discount")} AS part_value
        FROM lineitem JOIN regional ON l_suppkey = s_suppkey
        GROUP BY 1)
      SELECT l_partkey, part_value
      FROM per_part, (SELECT SUM(part_value) AS total_value FROM per_part) t
      WHERE part_value * 1000.0 > total_value"""))

  /** Q13 shape: customer order-count distribution. The classic
    * comment-pattern exclusion becomes a priority exclusion (no comment
    * column). LEFT join keeps zero-order customers (count = 0 bucket);
    * two partial/final aggregates, the second over a tiny key space. */
  private val q13 = QueryDef(
    "q_tpch_q13",
    (s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, d, "customer").select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count"""))

  /** Q15 shape: top supplier(s) by quarterly revenue. The revenue "view"
    * aggregates once per supplier; the maximum is a one-row broadcast and
    * the equality test stays in exact decimal on both engines (the double
    * cast happens only on output), so ties are found identically. */
  private val q15 = QueryDef(
    "q_tpch_q15",
    (s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))).as("rev_dec"))
      val maxRev = rev.agg(max(col("rev_dec")).as("max_rev"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("rev_dec") === col("max_rev"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast(DoubleType).as("total_revenue"))
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey,
          SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
      FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)"""))

  /** Q16 shape: how many suppliers can serve each part group. Supplier
    * "complaints" stand in as negative account balance; the exclusion is
    * a broadcast anti join (NOT IN over a null-free key). countDistinct
    * dedups (group, supplier) map-side before the final count. */
  private val q16 = QueryDef(
    "q_tpch_q16",
    (s, d) => {
      val p = broadcast(t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
      val excl = broadcast(t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey")))
      t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""SELECT p_brand, p_type, p_size,
        CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3"""))

  /** Q20 shape: potential part promotion. "Available quantity" stands in
    * as a pair's all-time shipped quantity, so a supplier qualifies when
    * more than half of some qualifying part's volume shipped in 1996.
    * The half test is `2 * recent > total` in exact BIGINT (no 0.5
    * float); pairs with no 1996 shipments yield NULL and drop on both
    * engines. One (supplier, part) aggregate over the part-filtered fact,
    * then a semi join gates the regional supplier dimension. */
  private val q20 = QueryDef(
    "q_tpch_q20",
    (s, d) => {
      val qual = broadcast(t(s, d, "part").filter(col("p_name").startsWith("small"))
        .select(col("p_partkey")))
      val recent = col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01")
      val flows = t(s, d, "lineitem")
        .join(qual, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast(LongType)).as("total_qty"),
          sum(when(recent, col("l_quantity").cast(LongType))).as("recent_qty"))
        .filter(lit(2L) * col("recent_qty") > col("total_qty"))
        .select(col("l_suppkey"))
      val n = broadcast(t(s, d, "nation")
        .select(col("n_nationkey"), col("n_regionkey")))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey")))
      t(s, d, "supplier")
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .join(flows, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
    },
    Some("""SELECT s_name, s_acctbal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
          GROUP BY l_suppkey, l_partkey
          HAVING 2 * SUM(CAST(l_quantity AS BIGINT))
              FILTER (WHERE l_shipdate >= DATE '1996-01-01'
                        AND l_shipdate < DATE '1997-01-01')
            > SUM(CAST(l_quantity AS BIGINT)))"""))

  val all: Seq[QueryDef] =
    Seq(q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15, q16,
      q17, q18, q19, q20, q21, q22)
}
