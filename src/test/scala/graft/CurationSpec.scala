package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Semantic + plan contracts for the curation operators (pipeline/Curation).
  * The DuckDB hash gate proves value equality; these assert the invariants
  * the oracle can't see — plan shape at scale and internal consistency. */
class CurationSpec extends SparkSpec {

  test("q_k_anonymity matches a plain-Scala equivalence-class recompute") {
    import org.apache.spark.sql.functions.col
    val rows = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 500))
    val expect = rows.groupBy(identity).map { case (qi, xs) =>
      (qi._1, qi._2, qi._3, xs.length.toLong, xs.length < 5)
    }.toSet
    val got = SparkEntry.queries("q_k_anonymity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == expect, s"k-anonymity diverged: got ${got.size} want ${expect.size}")
    // The audit must be load-bearing in both directions on the gate
    // corpus: some classes safe, and the flag exactly thresholds n_docs.
    assert(got.exists(_._5) || got.forall(_._4 >= 5))
    assert(got.forall { case (_, _, _, n, risk) => risk == (n < 5) })
  }

  test("q_l_diversity matches a plain-Scala recompute and flags leaky classes") {
    import org.apache.spark.sql.functions.col
    val rows = Tables.t(spark, sfDir, "documents")
      .select(col("source"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 500, r.getString(2)))
    val expect = rows.groupBy(x => (x._1, x._2)).map { case ((src, band), xs) =>
      val byLang = xs.groupBy(_._3).view.mapValues(_.size.toLong)
      val n = xs.length.toLong
      (src, band, n, byLang.size.toLong, byLang.values.max * 1000000L / n,
        byLang.size >= 2)
    }.toSet
    val got = SparkEntry.queries("q_l_diversity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got == expect, s"l-diversity diverged: got ${got.size} want ${expect.size}")
    // Internal consistency: the dominant share bounds 1/l from below and
    // 1 from above, and the flag matches the distinct count exactly.
    got.foreach { case (_, _, n, l, share, div) =>
      assert(l >= 1 && l <= n && share <= 1000000L && share * l >= 1000000L - l)
      assert(div == (l >= 2))
    }
  }

  // AQE wraps finished stages in leaf QueryStageExec nodes — flatten
  // through them (same traversal as PlanSpec).
  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flattenPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flattenPlan(q.plan)
    case _ => p +: p.children.flatMap(flattenPlan)
  }

  test("q_sequence_pack window is shard-partitioned (no global window)") {
    val df = SparkEntry.queries("q_sequence_pack")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    val windows = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected a WindowExec in the plan")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "sequence-pack window must partition by shard, never run globally")
  }

  test("q_sequence_pack conserves tokens and covers every document") {
    val d = sfDir
    val packed = SparkEntry.queries("q_sequence_pack")(spark, d)
      .agg(sum("n_docs").cast("long"), sum("bin_tokens").cast("long"))
      .head()
    val base = Tables.t(spark, d, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .agg(count(lit(1)), sum("n_tok")).head()
    assert(packed.getLong(0) == base.getLong(0), "every doc lands in a bin")
    assert(packed.getLong(1) == base.getLong(1), "token mass is conserved")
  }

  test("q_entropy_filter entropy is within [0, ln(n_tokens)]") {
    val bad = SparkEntry.queries("q_entropy_filter")(spark, sfDir)
      .filter(col("entropy_e6") < 0 ||
        col("entropy_e6") > log(col("n_tokens").cast("double")) * 1e6)
      .count()
    assert(bad == 0, "unigram entropy must be bounded by ln(vocab size)")
  }

  test("q_dedup_incremental counts are consistent with the odd/even split") {
    val d = sfDir
    val r = SparkEntry.queries("q_dedup_incremental")(spark, d)
    assert(r.filter(col("n_batch") =!= col("n_dup") + col("n_kept")).count() == 0)
    val totalNew = r.agg(sum("n_batch")).head().getLong(0)
    val oddDocs = Tables.t(spark, d, "documents")
      .filter(col("doc_id") % 2 === 1).count()
    assert(totalNew == oddDocs, "every batch doc is counted exactly once")
  }

  test("q_dedup_bloom equals the exact incremental answer and the prefilter bites") {
    val d = sfDir
    def keyed(name: String) = SparkEntry.queries(name)(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val bloom = keyed("q_dedup_bloom")
    assert(bloom == keyed("q_dedup_incremental"),
      "bloom-prefiltered result must be bit-identical to the exact join")
    // Certificate side, asserted directly against the views the build
    // registered: no store member is ever bloom-rejected (a bloom filter
    // has no false negatives), and the prefilter rejects a nontrivial
    // share of the batch before the store join.
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d/documents.parquet".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val bloomSql = "(SELECT graft_bloom_agg(xxhash64(store_fp), 100000L, 800000L) " +
      s"FROM graft_bloom_store_$sfx)"
    val fn = spark.sql(s"""SELECT COUNT(*) FROM graft_bloom_batch_$sfx b
        JOIN graft_bloom_store_$sfx s ON b.fp = s.store_fp
        WHERE NOT graft_bloom_contains($bloomSql, xxhash64(b.fp))""")
      .head().getLong(0)
    assert(fn == 0L, "bloom produced a false negative — impossible by contract")
    val rejected = spark.sql(s"""SELECT COUNT(*) FROM graft_bloom_batch_$sfx
        WHERE NOT graft_bloom_contains($bloomSql, xxhash64(fp))""")
      .head().getLong(0)
    val nBatch = bloom.values.map(_._1).sum
    assert(rejected > 0, "prefilter never rejected a row — sketch misconfigured")
    info(s"bloom prefilter rejected $rejected/$nBatch batch rows before the store join")
  }

  test("q_span_corrupt matches a plain-Scala rendering of the transform") {
    // Independent third derivation: rebuild every doc's corrupted input
    // and target strings in plain Scala (same seeded-md5 offsets) and
    // compare the fingerprints the gate hashes.
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val (id, toks) = (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty))
        if (toks.isEmpty) None
        else {
          val nb = toks.length / 20
          val offs = (0 until nb).map(b =>
            (java.lang.Long.parseLong(
              md5hex(s"graft-span-1:$id:$b").substring(0, 8), 16) % 18).toInt)
          val input = (0 until nb).flatMap { b =>
            toks.slice(20 * b, 20 * b + offs(b)) ++ Seq(s"<extra_id_$b>") ++
              toks.slice(20 * b + offs(b) + 3, 20 * (b + 1))
          } ++ toks.drop(20 * nb)
          val target = (0 until nb).flatMap { b =>
            Seq(s"<extra_id_$b>") ++ toks.slice(20 * b + offs(b), 20 * b + offs(b) + 3)
          } ++ Seq(s"<extra_id_$nb>")
          Some(id -> ((toks.length.toLong, nb.toLong, 3L * nb,
            md5hex(input.mkString(" ")), md5hex(target.mkString(" ")))))
        }
      }.toMap
    val got = SparkEntry.queries("q_span_corrupt")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(5), r.getString(6)))).toMap
    assert(got == expect, s"span corruption diverged (got ${got.size} docs, " +
      s"want ${expect.size})")
    assert(expect.values.exists(_._2 > 0), "fixture expectation: some doc has a full block")
  }

  test("q_inverted_index posting length equals df") {
    val bad = SparkEntry.queries("q_inverted_index")(spark, sfDir)
      .filter(size(split(col("posting"), ",")) =!= col("df"))
      .count()
    assert(bad == 0, "posting list must carry exactly df doc ids")
  }

  test("q_pii_scrub fingerprint changes iff something was redacted") {
    val d = sfDir
    val orig = Tables.t(spark, d, "documents")
      .select(col("doc_id"), md5(col("text")).as("orig_fp"))
    val bad = SparkEntry.queries("q_pii_scrub")(spark, d)
      .join(orig, "doc_id")
      .filter((col("n_redacted") > 0) === (col("redacted_fp") === col("orig_fp")))
      .count()
    assert(bad == 0, "redaction must change the text exactly when it fires")
  }

  test("q_centroid_classify broadcasts the centroids (no fact-side shuffle join)") {
    val df = SparkEntry.queries("q_centroid_classify")(spark, sfDir)
    df.collect()
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "centroid table (labels x dims) must ride a broadcast join")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "the dim-keyed join must never shuffle the exploded fact side")
  }

  test("q_centroid_classify assigns every vector to exactly one label") {
    val d = sfDir
    val total = SparkEntry.queries("q_centroid_classify")(spark, d)
      .agg(sum("n_vecs")).head().getLong(0)
    val vecs = Tables.t(spark, d, "embeddings").count()
    assert(total == vecs, "confusion matrix must cover every vector once")
  }

  test("q_quality_repetition fractions are valid and keep matches them") {
    val r = SparkEntry.queries("q_quality_repetition")(spark, sfDir)
    val bad = r.filter(
      col("top_bigram_frac_e6") < 0 || col("top_bigram_frac_e6") > 1000000 ||
        col("dup_trigram_frac_e6") < 0 || col("dup_trigram_frac_e6") > 1000000 ||
        col("keep") =!= (col("top_bigram_frac_e6") <= 180000 &&
          col("dup_trigram_frac_e6") <= 300000)).count()
    assert(bad == 0)
  }

  test("q_snapshot_diff classifies exactly the derived add/remove/edit sets") {
    val ids = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected =
      ids.filter(_ % 11 == 3).map(_ -> "removed") ++
        ids.filter(i => i % 7 == 2 && i % 11 != 3).map(_ -> "changed") ++
        ids.filter(_ % 13 == 5).map(i => (-i - 1L) -> "added")
    val got = SparkEntry.queries("q_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got == expected,
      s"diff mismatch: extra=${got -- expected} missing=${expected -- got}")
    // Unchanged docs never appear — the diff is sparse by construction.
    assert(got.map(_._1).intersect(
      ids.filter(i => i % 11 != 3 && i % 7 != 2)).isEmpty)
  }

  test("q_snapshot_drift: per-bucket PSI terms are non-negative and detect the drift") {
    val rows = SparkEntry.queries("q_snapshot_drift")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "histogram should have buckets")
    // (pa-pb) and ln(pa/pb) always share sign, so every true PSI term is
    // >= 0 and the e6 floor preserves that.
    val neg = rows.filter(_._4 < 0)
    assert(neg.isEmpty, s"negative PSI contributions: ${neg.take(3)}")
    // The derived snapshot really drifts (deletions + edits + recrawls),
    // so total PSI must be strictly positive.
    assert(rows.map(_._4).sum > 0, "derived snapshot should show drift")
  }

  test("q_self_bleu matches a plain-Scala clipped-precision recompute") {
    // Third derivation: rebuild the seeded sample, gram counts, clipping,
    // and closest-reference lengths from the raw corpus.
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        md5(concat(lit("graft-selfbleu-1:"), col("doc_id").cast("string"))).as("hx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def fold(hx: String): Long = (0 until 8).map { i =>
      ("0123456789abcdef".indexOf(hx(i)).toLong) * (1L << (4 * (7 - i)))
    }.sum
    val samp = docs.sortBy { case (id, _, hx) => (fold(hx), id) }.take(16)
      .map { case (id, t, _) => id -> t.split(' ').filter(_.nonEmpty).toSeq }
      .filter(_._2.length >= 2)
    def counts(toks: Seq[String], n: Int): Map[String, Long] =
      toks.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val expect = samp.map { case (cid, ctoks) =>
      val refs = samp.filter(_._1 != cid)
      def pr(n: Int): (Long, Long) = {
        val cc = counts(ctoks, n)
        val rcs = refs.map(r => counts(r._2, n))
        val num = cc.map { case (g, c) =>
          math.min(c, rcs.map(_.getOrElse(g, 0L)).max) }.sum
        (num, cc.values.sum)
      }
      val clen = ctoks.length.toLong
      val (_, rlen) = refs
        .map(r => (r._1, r._2.length.toLong))
        .minBy { case (rid, rl) => (math.abs(rl - clen), rl, rid) }
      val (p1n, p1d) = pr(1); val (p2n, p2d) = pr(2)
      (cid, clen, rlen, p1n, p1d, p2n, p2d)
    }.toSet
    val got = SparkEntry.queries("q_self_bleu")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect, s"self-bleu diverged: got ${got.size} want ${expect.size}")
    // The components finish to a well-formed BLEU-2 in [0, 1]: clipped
    // numerators never exceed denominators, and the brevity inputs are
    // positive — the float score is the consumer's one exp away.
    got.foreach { case (_, cl, rl, p1n, p1d, p2n, p2d) =>
      assert(p1n <= p1d && p2n <= p2d && cl >= 2 && rl >= 2)
      val bleu = math.exp(math.min(0.0, 1.0 - rl.toDouble / cl)) *
        math.sqrt((p1n.toDouble / p1d) * (p2n.toDouble / p2d))
      assert(bleu >= 0.0 && bleu <= 1.0)
    }
  }
}
