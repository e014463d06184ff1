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
}
