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

  val all: Seq[QueryDef] = Seq(q3, q5, q10, q18)
}
