package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule (plans/JaccardLengthPruning): a naive
  * `graft_jaccard(a,b) >= t` filter must pick up the implied size-ratio
  * guard automatically, without changing results. */
class PlansSpec extends SparkSpec {

  private def pairs() = {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(1L, 2L, 3L, 4L)),
      (2L, Seq(1L, 2L, 3L, 9L)),
      (3L, Seq(1L, 9L)),        // length-incompatible with 4-element sets at t=0.5... (2*0.5<=4 holds) — but not with doc 4
      (4L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 12L)),
      (5L, Seq.empty[Long]))
      .toDF("id", "s")
    docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.s").as("sa"), col("b.s").as("sb"))
  }

  test("jaccard threshold filters gain the implied length guard") {
    val df = pairs().filter(call_function("graft_jaccard", col("sa"), col("sb")) >= 0.5)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("size("), s"length guard not injected:\n$opt")
    assert(opt.contains("graft_jaccard"), opt)
  }

  test("the rewrite is result-equivalent to the unaugmented predicate") {
    val got = pairs()
      .filter(call_function("graft_jaccard", col("sa"), col("sb")) >= 0.5)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Independent formulation that the rule does not match (no
    // JaccardSimilarity expression in the filter).
    val expected = pairs()
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("u", size(col("sa")) + size(col("sb")) - col("i"))
      .filter(col("u") > 0 && col("i").cast("double") / col("u") >= 0.5)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"rule changed results: $got vs $expected")
  }

  test("hand-tuned filters that already mention size() are left untouched") {
    val df = pairs().filter(
      size(col("sa")) * 0.5 <= size(col("sb")) &&
        call_function("graft_jaccard", col("sa"), col("sb")) >= 0.5)
    // Exactly the user's two size() calls — the rule must not add more.
    val opt = df.queryExecution.optimizedPlan.toString
    val n = "size\\(".r.findAllIn(opt).length
    assert(n <= 2, s"rule re-augmented a hand-tuned filter ($n size calls):\n$opt")
  }

  // --- WindowTopKRewrite + TopKPerGroupExec (plans/TopKPerGroup.scala) ---

  private def windowTopK(keepRank: Boolean) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val ranked = Tables.t(spark, sfDir, "customer")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    if (keepRank)
      ranked.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("rk"))
    else
      ranked.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
  }

  test("row_number top-k idiom plans the custom TopKPerGroupExec, partial below the exchange") {
    val p = windowTopK(keepRank = false).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window"), s"window still present:\n$p")
    // Partial stage must sit BELOW the exchange (pre-shuffle reduction),
    // final above — the aggregate-style two-phase shape.
    val partialIdx = p.indexOf("TopKPerGroupPartial")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(c_nationkey")
    val finalIdx = p.indexOf("TopKPerGroup ")
    assert(partialIdx >= 0 && exchangeIdx >= 0 && finalIdx >= 0, p)
    // Plan trees print top-down: final < exchange < partial.
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"two-phase shape wrong (final=$finalIdx exchange=$exchangeIdx partial=$partialIdx):\n$p")
  }

  test("the top-k rewrite is result-equivalent to the window form") {
    // Keeping the rank column in the projection suppresses the rewrite —
    // that IS the baseline window execution.
    val baseline = windowTopK(keepRank = true)
    assert(!baseline.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "baseline unexpectedly rewritten")
    val got = windowTopK(keepRank = false).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val exp = baseline.drop("rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == exp, s"rewrite changed results (${got.size} vs ${exp.size} rows)")
  }

  test("rank() and retained-rank queries are NOT rewritten") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    // rank() keeps ties beyond k — must stay a window.
    val rankQ = Tables.t(spark, sfDir, "customer")
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
      .select(col("c_custkey"))
    assert(!rankQ.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }
}
