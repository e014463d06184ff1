package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join split handles most runtime skew (enabled by default in
  * the graft sessions); these helpers cover the cases AQE can't re-plan:
  * a groupBy whose partial aggregate is already dominated by one key, and
  * a join against a dimension with a known hot key.
  */
object Skew {

  /** Two-phase salted aggregation: spread each group over `saltBuckets`
    * sub-groups, partially aggregate, then merge. Use when one group holds
    * an outsized share of rows (map-side combine alone still funnels that
    * group's partials through one reducer; salting splits the reduce too).
    *
    * `partials` aggregate a salted sub-group; `merge` combines sub-group
    * results (sum→sum, count→sum, min→min, ...). Both phases stay
    * hash-partitioned, so the plan is two exchanges of |groups|*salt and
    * |groups| rows — never a single hot reducer.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[Column],
      saltBuckets: Int,
      partials: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Broadcast-replicated join against a skewed fact: replicate each
    * dimension row `saltBuckets` times with an explicit salt, salt the fact
    * rows randomly, and join on (key, salt) — every fact partition meets a
    * local copy of the hot dimension rows instead of all shuffling to one
    * reducer. Only worthwhile when the dimension is small enough to
    * replicate; for big-big skew, rely on AQE's skew-join split. */
  def saltedBroadcastJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(broadcast(replicatedDim),
      factKey === dimKey && saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }

  /** The salted aggregation as a gate-level query: `l_returnflag` has only
    * 3 values over the whole fact table — the textbook hot-reducer shape
    * (every row funnels into 3 reduce groups). Salting spreads each group
    * over 8 sub-groups before the merge. The salt is physical only, so the
    * result must equal the plain GROUP BY — which is exactly what the
    * DuckDB oracle asserts (and why any salt leak into the output would be
    * caught). Sums are cast to BIGINT (integral quantities) for
    * summation-order-independent parity. */
  private val skewSaltedAgg = QueryDef(
    "q_skew_salted_agg",
    (s, d) =>
      saltedAggregate(
        Tables.t(s, d, "lineitem"),
        keys = Seq(col("l_returnflag")),
        saltBuckets = 8,
        partials = Seq(sum(col("l_quantity").cast("long")).as("p_qty"),
          count(lit(1)).as("p_n")),
        merge = Seq(sum(col("p_qty")).as("sum_qty"),
          sum(col("p_n")).as("n_rows"))),
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag"""))

  val all: Seq[QueryDef] = Seq(skewSaltedAgg)
}
