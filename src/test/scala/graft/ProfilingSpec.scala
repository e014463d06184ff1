package graft

import org.apache.spark.sql.functions._

/** Semantic + plan contracts for the profiling/sketching/reshaping ops
  * added in round 5 (pipeline/Profiling, q_chunk_documents,
  * q_lang_rebalance). The DuckDB hash gate proves cross-engine equality;
  * these assert the invariants the oracle can't express. */
class ProfilingSpec extends SparkSpec {

  test("q_profile_table stats are internally consistent") {
    val rows = SparkEntry.queries("q_profile_table")(spark, sfDir).collect()
    assert(rows.length == 5, "five profiled columns")
    rows.foreach { r =>
      val (n, nNull, nDist) =
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"))
      assert(nNull >= 0 && nNull <= n)
      assert(nDist >= 0 && nDist <= n - nNull,
        s"${r.getAs[String]("col_name")}: distinct must not exceed non-null rows")
      // min/max are stringified in the profile row: compare numerically for
      // numeric source columns (lexicographic "9" > "10" would false-fail),
      // lexicographically for strings and %Y-%m-%d dates (order-isomorphic).
      val (mn, mx) = (r.getAs[String]("min_val"), r.getAs[String]("max_val"))
      val numericCols = Set("o_orderkey", "o_custkey")
      if (numericCols(r.getAs[String]("col_name"))) assert(mn.toLong <= mx.toLong)
      else assert(mn <= mx)
    }
  }

  test("q_sketch_cms never underestimates (one-sided error)") {
    val rows = SparkEntry.queries("q_sketch_cms")(spark, sfDir).collect()
    assert(rows.length == 20, "20 probe tokens")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS under-estimated ${r.getAs[String]("tok")}")
    }
  }

  test("q_sketch_cms_cert: the eps-N overcount contract holds on every probe") {
    // The gated certification face: both booleans must be TRUE per key
    // (the driver hash-gates the same contract against literal-TRUE
    // oracle rows; this spec localizes a break before the driver pass).
    val rows = SparkEntry.queries("q_sketch_cms_cert")(spark, sfDir).collect()
    assert(rows.length == 20, "20 probe tokens")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("never_under"),
        s"CMS under-estimated ${r.getAs[String]("tok")}")
      assert(r.getAs[Boolean]("within_eps"),
        s"CMS overcount for ${r.getAs[String]("tok")} broke the eps*N bound")
    }
  }

  test("q_chunk_documents covers every token exactly (window/stride contract)") {
    val chunks = SparkEntry.queries("q_chunk_documents")(spark, sfDir)
    // Per doc: chunk ids contiguous from 0, every chunk non-empty and <= 64,
    // and the last chunk's end (stride*last + n_toks) == doc token count.
    val perDoc = chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_id")).as("max_id"),
      min(col("n_toks")).as("min_len"),
      max(col("n_toks")).as("max_len"),
      max(col("chunk_id") * 48 + col("n_toks")).as("covered"))
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n"))
      .filter(col("n") >= 1)
    val joined = perDoc.join(docs, "doc_id")
    assert(joined.count() == docs.count(), "every non-empty doc chunks")
    val bad = joined.filter(
      col("n_chunks") =!= col("max_id") + 1 ||
        col("min_len") < 1 || col("max_len") > 64 ||
        col("covered") =!= col("n")).count()
    assert(bad == 0, "chunks must tile the token stream at stride 48")
  }

  test("q_quality_classifier is map-only (zero exchanges) and keep matches score") {
    val df = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quality classifier must be a pure scan->project stage:\n$plan")
    val bad = df.filter(col("keep") =!= (col("score_e6") >= 0L)).count()
    assert(bad == 0, "keep must be exactly the thresholded score")
  }

  test("q_perplexity_lm costs are nonnegative and cover all multi-token docs") {
    val r = SparkEntry.queries("q_perplexity_lm")(spark, sfDir)
    assert(r.filter(col("nll_e6") < 0 || col("n_bigrams") < 1).count() == 0,
      "add-one smoothing guarantees cost >= 0 per bigram")
    val expected = Tables.t(spark, sfDir, "documents")
      .filter(size(expr("filter(split(text, ' '), x -> x != '')")) >= 2).count()
    assert(r.count() == expected, "every doc with >= 2 tokens gets a score")
  }

  test("q_kneser_ney matches a plain-Scala brute force (third derivation)") {
    val got = SparkEntry.queries("q_kneser_ney")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("kn_nll_e6"))).toMap
    val texts = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(' ').filter(_.nonEmpty).toSeq)
      .filter(_._2.length >= 2)
    val inst = texts.flatMap { case (id, toks) =>
      toks.sliding(2).map(w => (id, (w(0), w(1)))).toSeq }
    val c2 = inst.groupBy(_._2).map { case (bg, xs) => bg -> xs.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val n1fw = c2.groupBy(_._1._1).map { case (p, m) => p -> m.size.toLong }
    val n1bw = c2.groupBy(_._1._2).map { case (c, m) => c -> m.size.toLong }
    val t = c2.size.toDouble
    val cost = c2.map { case (bg @ (p, c), n) =>
      val prob = (n - 0.75) / c1(p) + 0.75 * n1fw(p) / c1(p) * n1bw(c) / t
      bg -> math.floor(-math.log(prob) * 1e6).toLong
    }
    val want = inst.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map(x => cost(x._2)).sum
      id -> (xs.length.toLong, s / xs.length)
    }
    assert(got == want, "per-doc KN NLL must equal the definitional recompute")
    assert(got.nonEmpty && got.values.forall(v => v._2 >= 0),
      "discounted probabilities stay <= 1, so costs stay nonnegative")
  }

  test("q_pmi_collocations matches a plain-Scala brute force") {
    val texts = Tables.t(spark, sfDir, "documents")
      .select(col("text")).collect()
      .map(_.getString(0).split(' ').filter(_.nonEmpty).toSeq)
      .filter(_.length >= 2)
    val inst = texts.flatMap(_.sliding(2).map(w => (w(0), w(1))).toSeq)
    val c2 = inst.groupBy(identity).map { case (bg, xs) => bg -> xs.length.toLong }
    val cl = c2.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val cr = c2.groupBy(_._1._2).map { case (c, m) => c -> m.values.sum }
    val t = c2.values.sum
    val want = c2.toSeq.collect { case ((p, c), n) if n >= 5 =>
      (p, c, n, math.floor(math.log((n * t).toDouble / (cl(p) * cr(c)).toDouble) * 1e6).toLong)
    }.sortBy { case (p, c, _, e) => (-e, p, c) }.take(50).toSet
    val got = SparkEntry.queries("q_pmi_collocations")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"PMI diverged: got ${got.size} want ${want.size}")
    assert(got.nonEmpty, "count floor must leave collocations on the gate corpus")
  }

  test("q_zipf_slope matches a plain-Scala rank-anchor recompute") {
    val counts = Tables.t(spark, sfDir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(' ').filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    val byRank = ranked.zipWithIndex.map { case ((_, c), i) => (i + 1).toLong -> c }.toMap
    val want = Seq((1L, 10L), (10L, 100L), (100L, 1000L)).collect {
      case (lo, hi) if byRank.contains(lo) && byRank.contains(hi) =>
        val e = math.floor((math.log(byRank(lo).toDouble) - math.log(byRank(hi).toDouble)) /
          (math.log(hi.toDouble) - math.log(lo.toDouble)) * 1e6).toLong
        (lo, hi, byRank(lo), byRank(hi), e)
    }.toSet
    val got = SparkEntry.queries("q_zipf_slope")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"zipf diverged: got $got want $want")
    // Natural-text contract: frequency decays with rank, so every local
    // exponent is positive.
    assert(got.nonEmpty && got.forall(_._5 > 0), "slope must be positive on text")
  }

  test("q_substring_dedup: verbatim copies have full span coverage") {
    val r = SparkEntry.queries("q_substring_dedup")(spark, sfDir)
    assert(r.filter(col("n_dup") > col("n_spans") ||
      col("dup_frac_e6") < 0 || col("dup_frac_e6") > 1000000).count() == 0,
      "coverage must be a valid fraction of the doc's spans")
    // Any doc whose exact text appears under another doc_id must be fully
    // covered — every one of its spans exists elsewhere by construction.
    val copies = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("n_same",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("n_same") >= 2)
      .select(col("doc_id"))
    val notFull = copies.join(r, "doc_id")
      .filter(col("dup_frac_e6") =!= 1000000L).count()
    assert(notFull == 0, "an exact copy must have dup_frac_e6 == 1e6")
    // This corpus's near-dups are shifted/partial copies (not always
    // byte-identical), so full-coverage docs must exist even when the
    // md5-identical set is empty.
    assert(r.filter(col("dup_frac_e6") === 1000000L).count() > 0,
      "corpus plants near-duplicates; expected at least one fully-covered doc")
  }

  test("q_lang_rebalance flattens the distribution (temperature contract)") {
    val rows = SparkEntry.queries("q_lang_rebalance")(spark, sfDir).collect()
    val tot = rows.map(_.getAs[Long]("weight_e6")).sum
    assert(tot <= 1000000L && tot > 1000000L - rows.length,
      "integer weights must sum to 1e6 minus at most one truncation ulp each")
    // sqrt temperature: the max/min WEIGHT ratio must be strictly smaller
    // than the max/min COUNT ratio (that's what 'up-sample low-resource
    // languages' means).
    val byCount = rows.sortBy(_.getAs[Long]("n_docs"))
    val (lo, hi) = (byCount.head, byCount.last)
    val countRatio = hi.getAs[Long]("n_docs").toDouble / lo.getAs[Long]("n_docs")
    val weightRatio = hi.getAs[Long]("weight_e6").toDouble / lo.getAs[Long]("weight_e6")
    assert(weightRatio < countRatio, "sqrt temperature must flatten the skew")
  }

  test("q_quality_auc equals the brute-force pairwise Mann-Whitney AUC") {
    // Independent derivation: collect (score, label) and count ordered
    // pairs directly — every (pos, neg) pair contributes 2 if the
    // positive outscores the negative, 1 on a tie (the x2 integer form
    // the query uses to keep the half exact).
    val score = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = SparkEntry.queries("q_quality_gopher")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val pos = label.collect { case (id, true) => score(id) }.toSeq
    val neg = label.collect { case (id, false) => score(id) }.toSeq
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val row = SparkEntry.queries("q_quality_auc")(spark, sfDir).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (pos.size.toLong, neg.size.toLong, u2),
      s"AUC components diverged: got $row, want (${pos.size}, ${neg.size}, $u2)")
    assert(row.getLong(3) ==
      u2 * 1000000L / (2L * pos.size * neg.size), "auc_e6 arithmetic")
    // The metric must be informative on this corpus: the cheap score
    // should rank gate-passing docs above failing ones better than chance.
    assert(row.getLong(3) > 550000L,
      s"quality score uninformative for the gopher gate: auc_e6 = ${row.getLong(3)}")
  }

  test("q_calibration_ece matches a plain-Scala reliability recompute") {
    // Independent derivation off the same registered inputs: normalize,
    // bin, and average in plain Scala integer arithmetic.
    val score = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = SparkEntry.queries("q_quality_gopher")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val ids = score.keySet.intersect(label.keySet).toSeq
    val mn = ids.map(score).min
    val rng = math.max(ids.map(score).max - mn, 1L)
    val binned = ids.groupBy { id =>
      math.min(9L, ((score(id) - mn) * 1000000L / rng) / 100000L)
    }
    val expect = binned.map { case (b, xs) =>
      val n = xs.size.toLong
      val conf = xs.map(id => (score(id) - mn) * 1000000L / rng).sum / n
      val acc = xs.count(label) * 1000000L / n
      (b, n, conf, acc, math.abs(conf - acc))
    }.toSet
    val eceExpect = expect.toSeq.map { case (_, n, _, _, g) => n * g }.sum /
      expect.toSeq.map(_._2).sum
    val got = SparkEntry.queries("q_calibration_ece")(spark, sfDir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSet == expect, "reliability table diverged")
    assert(got.forall(_.getLong(5) == eceExpect), s"ece diverged: want $eceExpect")
    // Gap bound: conf and acc are both e6 fractions, so is every gap.
    assert(got.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 1000000L))
  }
}
