package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the LLM-pipeline operators that have no SQL oracle
  * (probabilistic bucketing, seed-specific hashes, binary decode): planted
  * duplicates must be found, LSH recall must beat a floor, and the stubbed
  * multimodal decode must match an independent computation.
  */
class PipelineSpec extends SparkSpec {

  test("q_dedup_ngram finds exactly the planted near-dup pairs (vs all-pairs truth)") {
    // Ground truth by brute force at sf0.001: all pairs with trigram
    // Jaccard >= 0.5. The prefix-filtered join must match exactly.
    val sh = Tables.t(spark, sfDir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles",
        expr("array_distinct(transform(sequence(1, greatest(size(toks) - 2, 0)), " +
          "i -> concat_ws(' ', slice(toks, i, 3))))"))
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("n"))
      .filter(col("n") > 0)
    val truth = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("i", size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .withColumn("j", col("i").cast("double") /
        (col("a.n") + col("b.n") - col("i")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    assert(got == truth,
      s"prefix-filtered join diverged from all-pairs truth: got ${got.size}, want ${truth.size}")
  }

  test("q_dedup_minhash recalls all planted pairs with J >= 0.9") {
    val strong = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .filter(col("j_e6") >= 900000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    // P(miss a J>=0.9 pair) = (1-0.9^4)^8 ~ 2e-4 per pair.
    assert(strong.subsetOf(got),
      s"minhash missed strong pairs: ${strong -- got}")
  }

  test("the strategy-pair stores are built once and reused across the family") {
    // VERDICT r12 #1/#7: the simhash banding must be derived once per
    // (corpus, JVM) and SHARED by q_dedup_simhash + q_dedup_auto's
    // default route; the minhash banding once, shared by q_dedup_minhash,
    // q_dedup_recall_cert and q_dedup_cross_source. Warm every store the
    // family touches, then assert the GLOBAL build counter stays flat
    // while every consumer re-runs — no store of any kind is rebuilt.
    val consumers = Seq("q_dedup_simhash", "q_dedup_auto", "q_dedup_minhash",
      "q_dedup_recall_cert", "q_dedup_cross_source")
    Sessions.clearGridSite(pipeline.Dedup.GRID_METRIC_PREFIX + "simhash")
    consumers.foreach(q => SparkEntry.queries(q)(spark, sfDir).count())
    assert(pipeline.Dedup.storedStrategies(sfDir) == Set("simhash", "minhash"))
    val builds = Tables.tempBuildCount
    val simhashRows = SparkEntry.queries("q_dedup_simhash")(spark, sfDir).count()
    consumers.foreach(q => SparkEntry.queries(q)(spark, sfDir).count())
    assert(Tables.tempBuildCount == builds,
      "a warm re-run of the dedup family rebuilt a content-keyed store")
    assert(simhashRows ==
      SparkEntry.queries("q_dedup_auto")(spark, sfDir).count(),
      "q_dedup_auto's default route should serve the simhash store")
  }

  test("q_cc_ab rides the ccStars store q_cc_stars built (one LS/SS " +
      "derivation per corpus, VERDICT r13 #5)") {
    // Warm BOTH stores the A/B consumes: the converged LS/SS edges
    // (q_cc_stars) and the hash-to-min labels (q_dedup_clusters).
    SparkEntry.queries("q_cc_stars")(spark, sfDir).count()
    SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count()
    val builds = Tables.tempBuildCount
    val ab = SparkEntry.queries("q_cc_ab")(spark, sfDir)
    assert(ab.count() > 0)
    assert(Tables.tempBuildCount == builds,
      "q_cc_ab rebuilt a store the q_cc_stars run should have left warm")
    // And the A/B certificate still certifies: every node agrees.
    assert(ab.filter(org.apache.spark.sql.functions.col("agree") === 0L)
      .count() == 0L, "LS/SS and hash-to-min labels diverged on the gate corpus")
  }

  test("q_dedup_simhash == exactly the J >= 0.5 pairs within its hamming radius") {
    // The precise simhash contract: candidate recall is 100% within
    // hamming <= SIMHASH_RADIUS (pigeonhole: <= 6 flips leave >= 2 of the
    // 8 chunks clean, so some 16-bit chunk PAIR matches), precision is
    // exact (Jaccard-verified) — so the output must equal the all-pairs
    // truth *intersected with the radius*, with hamming measured
    // independently here from the exposed fingerprints. sf0.001
    // deliberately contains pairs OUTSIDE the radius (a J=0.89 pair at
    // hamming 53: tf-weighted simhash vs set-Jaccard divergence), which
    // this test proves are the only misses.
    val fp = pipeline.Dedup.simhashFingerprints(
      Tables.t(spark, sfDir, "documents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inRadius = truth.filter { case (a, b) =>
      java.lang.Long.bitCount(fp(a) ^ fp(b)) <= pipeline.Dedup.SIMHASH_RADIUS
    }
    val got = SparkEntry.queries("q_dedup_simhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inRadius != truth,
      "fixture expectation: sf0.001 should contain out-of-radius pairs")
    assert(got == inRadius,
      s"missed in-radius: ${inRadius -- got} / spurious: ${got -- inRadius}")
  }

  test("q_ann_lsh multiprobe recall@5 vs brute force is 1.0") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"ANN LSH recall@5 = $recall%.2f (${lsh.size} candidates returned)")
    // Query-side multiprobing (hamming <= 3 of 8 bits x 16 tables) makes
    // P(miss) ~ 1e-5 even at the weakest true neighbors of this random
    // corpus — the result must be the exact brute-force top-k (which is
    // what the DuckDB oracle asserts at sf0.01 too).
    assert(recall == 1.0, f"multiprobe LSH missed true neighbors: $recall%.2f")
  }

  test("q_ann_ivf recall@5 vs brute force is >= 0.95") {
    val brute = SparkEntry.queries("q_ann_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"ANN IVF recall@5 = $recall%.2f " +
      f"(nprobe ${pipeline.Similarity.NPROBE}/${pipeline.Similarity.IVF_K} cells)")
    // Random 64-dim vectors are IVF's worst case (true neighbors scatter
    // across cells), so hitting 0.95 here costs nprobe=12 of 16 cells —
    // measured 0.68 @ 6, 0.90 @ 10, 0.96 @ 12. On clustered real
    // embeddings the same recall arrives at a small probe fraction; the
    // tuning knob, not the implementation, is what this corpus stresses.
    assert(recall >= 0.95, f"IVF recall below contract: $recall%.2f")
  }

  test("q_retrieval_eval matches an independent metric recomputation") {
    val got = SparkEntry.queries("q_retrieval_eval")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set("ivf", "lsh"))
    // Independent lane for the LSH row: plain-Scala metrics over the
    // registered defs' own results (the eval query must agree with what a
    // user computes by hand from the system + brute-force answers).
    val sys = SparkEntry.queries("q_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val truth = SparkEntry.queries("q_ann_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val hits = (sys.keySet intersect truth.keySet).size.toLong
    val rrSum = truth.collect { case ((qid, nid), 1) =>
      sys.get((qid, nid)).map(1000000L / _).getOrElse(0L)
    }.sum
    val (nq, k) = (pipeline.Similarity.NQ, pipeline.Similarity.K)
    assert(got("lsh") ==
      ((hits, hits * 1000000L / (nq * k), rrSum / nq)),
      s"lsh metrics drifted from the hand recomputation: ${got("lsh")}")
    // The IVF row carries the published tuning contract (recall >= 0.95
    // at nprobe 12/16 — same floor the dedicated recall test asserts).
    assert(got("ivf")._2 >= 950000L,
      s"IVF recall_e6 below the published contract: ${got("ivf")._2}")
  }

  test("q_domain_mix weights are a normalized, loss-monotone mixture") {
    val rows = SparkEntry.queries("q_domain_mix")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = rows.length
    assert(n >= 2, "fixture expectation: multiple sources")
    // Normalization: integer-floor division loses < 1 unit per domain.
    val wSum = rows.map(_._4).sum
    assert(wSum <= 1000000L && wSum > 1000000L - n,
      s"weights do not sum to ~1e6: $wSum over $n domains")
    // DoReMi monotonicity: excess = clamp(nll - reference), and a domain
    // with larger excess must never get a smaller weight (equality is
    // possible when the excess gap is below the 1e6/Σ floor resolution).
    rows.foreach { case (_, nll, ex, _) =>
      assert(ex >= 0L && (ex == 0L || ex <= nll)) }
    for (a <- rows; b <- rows if a._3 > b._3)
      assert(a._4 >= b._4,
        s"harder domain ${a._1} down-weighted vs ${b._1}")
    assert(rows.map(_._3).distinct.length > 1,
      "fixture expectation: domains should differ in excess loss")
  }

  test("q_curriculum phases match a plain-Scala exact-quantile recompute") {
    // Independent ground truth: collect every doc's NLL, sort, and take
    // the textbook order-statistic boundaries — b_q is the ceil(q*n/4)-th
    // smallest score, which is exactly "min score s with 4*cum(s) >= q*n"
    // (elements strictly below the t-th smallest number at most t-1).
    val nll = SparkEntry.queries("q_perplexity_lm")(spark, sfDir)
      .select("nll_e6").collect().map(_.getLong(0)).sorted
    val n = nll.length
    assert(n > 10, "fixture expectation: non-trivial corpus")
    def bound(q: Int): Long = nll(((q.toLong * n + 3) / 4 - 1).toInt)
    val (b1, b2, b3) = (bound(1), bound(2), bound(3))
    def phase(x: Long): Long =
      if (x <= b1) 1L else if (x <= b2) 2L else if (x <= b3) 3L else 4L
    val expect = nll.groupBy(phase).map { case (p, xs) =>
      p -> ((xs.length.toLong, xs.min, xs.max, xs.sum / xs.length,
        xs.length.toLong * 1000000L / n))
    }
    val got = SparkEntry.queries("q_curriculum")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect, s"phase stats diverged:\n got $got\nwant $expect")
    // Curriculum contract: four phases, ordered difficulty, full cover.
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"phases: ${got.keySet}")
    assert(got.values.map(_._1).sum == n, "phases do not partition corpus")
    for (p <- 1 to 3)
      assert(got(p.toLong)._3 <= got(p + 1L)._2,
        s"phase $p max NLL exceeds phase ${p + 1} min — order broken")
  }

  test("q_ccnet_buckets match a plain-Scala per-language tercile recompute") {
    // Independent ground truth: per language, sort the doc NLLs and take
    // the textbook order statistics — b_k is the ceil(k*n/3)-th smallest,
    // which is exactly "min v with 3*cum(v) >= k*n" (the query's rule).
    val nl = SparkEntry.queries("q_perplexity_lm")(spark, sfDir)
      .select("doc_id", "nll_e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langOf = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = nl.toSeq.groupBy { case (id, _) => langOf(id) }
      .map { case (l, xs) => l -> xs.map(_._2).sorted }
    assert(byLang.size > 1, "fixture expectation: multiple languages")
    def bound(xs: Seq[Long], k: Int): Long =
      xs(((k.toLong * xs.length + 2) / 3 - 1).toInt)
    val expect = byLang.flatMap { case (l, xs) =>
      val (b1, b2) = (bound(xs, 1), bound(xs, 2))
      def bucket(x: Long) =
        if (x <= b1) "head" else if (x <= b2) "middle" else "tail"
      xs.groupBy(bucket).map { case (bk, ys) =>
        (l, bk) -> ((ys.length.toLong, ys.min, ys.max,
          ys.length.toLong * 1000000L / xs.length, bk != "tail")) }
    }
    val got = SparkEntry.queries("q_ccnet_buckets")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(got == expect, s"bucket stats diverged:\n got $got\nwant $expect")
    // CCNet contract: buckets are ordered by difficulty within a language
    // and only the tail is dropped.
    for (l <- byLang.keys; (a, b) <- Seq("head" -> "middle", "middle" -> "tail"))
      for (x <- got.get((l, a)); y <- got.get((l, b)))
        assert(x._3 < y._2, s"$l: $a max NLL reaches into $b")
  }

  test("q_distinct_ngrams matches a plain-Scala recompute") {
    val docs = Tables.t(spark, sfDir, "documents").select("source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val expect = docs.groupBy(_._1).map { case (src, xs) =>
      val uni = xs.flatMap(_._2)
      val bi = xs.flatMap { case (_, t) =>
        t.sliding(2).filter(_.length == 2).map(_.mkString(" ")) }
      assert(bi.nonEmpty, s"fixture expectation: $src has multi-token docs")
      src -> ((uni.length.toLong, uni.distinct.length.toLong,
        uni.distinct.length.toLong * 1000000L / uni.length,
        bi.length.toLong, bi.distinct.length.toLong,
        bi.distinct.length.toLong * 1000000L / bi.length))
    }
    val got = SparkEntry.queries("q_distinct_ngrams")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"diversity stats diverged:\n got $got\nwant $expect")
  }

  test("q_ann_ivfpq recall@5 vs exact quantized-L2 truth") {
    // Independent plain-Scala ground truth: exact L2 top-5 per query over
    // the same quantization grid the index uses (vec_id >= NQ candidates,
    // ties to the lower nid — the index's own total order).
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e4).toLong).toArray)
      .toMap
    val nq = pipeline.Similarity.NQ
    val truth = (0L until nq.toLong).flatMap { qid =>
      val qv = vecs(qid)
      vecs.toSeq.filter(_._1 >= nq)
        .map { case (nid, v) =>
          (nid, qv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (nid, d2) => (d2, nid) }.take(5)
        .map { case (nid, _) => (qid, nid) }
    }.toSet
    val got = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect got).size.toDouble / truth.size
    info(f"IVF-PQ recall@5 = $recall%.2f " +
      f"(nprobe ${pipeline.Similarity.NPROBE}/${pipeline.Similarity.IVF_K}, " +
      f"ADC shortlist ${pipeline.Similarity.PQ_RERANK})")
    // Random uniform vectors are the worst case for BOTH stages (IVF cell
    // recall ~0.96 here; 4x16-dim PQ distance distortion is largest when
    // no subspace structure exists). The floor certifies the pipeline
    // stays useful even there; clustered real embeddings sit far higher.
    assert(recall >= 0.55, f"IVF-PQ recall collapsed: $recall%.2f")
  }

  test("q_pca_power matches a plain-Scala pinned recompute and finds the top axis") {
    val xs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .filter(v => !v.exists(_.isNaN))
      .map(_.map(x => math.floor(x * 10000.0).toLong))
    def idiv(a: Long, b: Long): Long = if (a < 0) -((-a) / b) else a / b
    var v = Array.fill(64)(1000000L)
    for (_ <- 1 to 8) {
      val w = xs.map(row => (0 until 64).map(j => row(j) * v(j)).sum)
      val ws = math.max(math.max(w.map(math.abs).max, 1L) / 100000L, 1L)
      val wp = w.map(idiv(_, ws))
      val y = (0 until 64).map(j =>
        xs.indices.map(i => xs(i)(j) * wp(i)).sum).toArray
      val ys = math.max(math.max(y.map(math.abs).max, 1L) / 1000000L, 1L)
      v = y.map(idiv(_, ys))
    }
    val got = SparkEntry.queries("q_pca_power")(spark, sfDir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).sortBy(_._1).map(_._2)
    assert(got.toSeq == v.toSeq,
      s"pinned recurrence diverged:\n got ${got.mkString(",")}\nwant ${v.mkString(",")}")
    // Quantization certificate: the integer direction must track the FLOAT
    // power iteration at the SAME round count (what the pinning may cost).
    // It cannot be compared to the converged eigenvector: this synthetic
    // corpus is near-isotropic (measured λ1/λ2 ≈ 1.017), so no fixed round
    // budget converges — a corpus property, not an operator one; the
    // output is defined as the round-8 state (the k-core precedent).
    var u = Array.fill(64)(1.0)
    for (_ <- 1 to 8) {
      val w = xs.map(row => (0 until 64).map(j => row(j) * u(j)).sum)
      val y = (0 until 64).map(j => xs.indices.map(i => xs(i)(j) * w(i)).sum)
      val n = math.sqrt(y.map(d => d * d).sum)
      u = y.map(_ / n).toArray
    }
    def cosv(a: Array[Double], b: Array[Double]): Double = {
      val d = (0 until 64).map(j => a(j) * b(j)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val c = math.abs(cosv(got.map(_.toDouble), u))
    assert(c > 0.999, s"integer iteration drifted from float iteration: |cos| = $c")
    // Progress certificate: the Rayleigh quotient R(v) = |Xv|²/|v|² must
    // not decrease from the uniform start — the iteration moves toward
    // dominant directions even when it cannot fully converge.
    def rayleigh(vv: Array[Double]): Double = {
      val num = xs.map { row =>
        val s = (0 until 64).map(j => row(j) * vv(j)).sum; s * s
      }.sum
      num / vv.map(x => x * x).sum
    }
    val r0 = rayleigh(Array.fill(64)(1.0))
    val r8 = rayleigh(got.map(_.toDouble))
    assert(r8 >= r0, s"Rayleigh quotient regressed: $r8 < $r0")
  }

  test("q_pca_deflate matches plain Scala and yields a near-orthogonal axis") {
    val xs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .filter(v => !v.exists(_.isNaN))
      .map(_.map(x => math.floor(x * 10000.0).toLong))
    def idiv(a: Long, b: Long): Long = if (a < 0) -((-a) / b) else a / b
    def round(v: Array[Long]): Array[Long] = {
      val w = xs.map(row => (0 until 64).map(j => row(j) * v(j)).sum)
      val ws = math.max(math.max(w.map(math.abs).max, 1L) / 100000L, 1L)
      val wp = w.map(idiv(_, ws))
      val y = (0 until 64).map(j =>
        xs.indices.map(i => xs(i)(j) * wp(i)).sum).toArray
      val ys = math.max(math.max(y.map(math.abs).max, 1L) / 1000000L, 1L)
      y.map(idiv(_, ys))
    }
    var v1 = Array.fill(64)(1000000L)
    for (_ <- 1 to 8) v1 = round(v1)
    val n1 = v1.map(x => x * x).sum
    def deflate(v: Array[Long]): Array[Long] = {
      val sp = (0 until 64).map(j => v(j) * v1(j)).sum
      val c = idiv(sp, math.max(n1 / 1000000L, 1L))
      (0 until 64).map(j => v(j) - idiv(c * v1(j), 1000000L)).toArray
    }
    var v2 = deflate(Array.fill(64)(1000000L))
    for (_ <- 1 to 8) v2 = deflate(round(v2))
    val got = SparkEntry.queries("q_pca_deflate")(spark, sfDir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == v1.toSeq, "chain-1 direction diverged")
    assert(got.map(_._3).toSeq == v2.toSeq, "deflated direction diverged")
    // Orthogonality certificate: one sign-magnitude projection per round
    // leaves at most integer-truncation residue along v1.
    def nrm(a: Array[Long]) = math.sqrt(a.map(x => x.toDouble * x).sum)
    val cosv = (0 until 64).map(j => v1(j).toDouble * v2(j)).sum / (nrm(v1) * nrm(v2))
    assert(math.abs(cosv) < 1e-3, s"axes not orthogonal: |cos| = ${math.abs(cosv)}")
    assert(v2.exists(_ != 0L), "deflated axis degenerate")
  }

  test("q_pca_variance matches plain Scala inside the isotropic band") {
    val xs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .filter(v => !v.exists(_.isNaN))
      .map(_.map(x => math.floor(x * 10000.0).toLong))
    def idiv(a: Long, b: Long): Long = if (a < 0) -((-a) / b) else a / b
    def round(v: Array[Long]): Array[Long] = {
      val w = xs.map(row => (0 until 64).map(j => row(j) * v(j)).sum)
      val ws = math.max(math.max(w.map(math.abs).max, 1L) / 100000L, 1L)
      val wp = w.map(idiv(_, ws))
      val y = (0 until 64).map(j =>
        xs.indices.map(i => xs(i)(j) * wp(i)).sum).toArray
      val ys = math.max(math.max(y.map(math.abs).max, 1L) / 1000000L, 1L)
      y.map(idiv(_, ys))
    }
    var v1 = Array.fill(64)(1000000L)
    for (_ <- 1 to 8) v1 = round(v1)
    val n1 = v1.map(x => x * x).sum
    def deflate(v: Array[Long]): Array[Long] = {
      val sp = (0 until 64).map(j => v(j) * v1(j)).sum
      val c = idiv(sp, math.max(n1 / 1000000L, 1L))
      (0 until 64).map(j => v(j) - idiv(c * v1(j), 1000000L)).toArray
    }
    var v2 = deflate(Array.fill(64)(1000000L))
    for (_ <- 1 to 8) v2 = deflate(round(v2))
    val trace = xs.map(_.map(x => x * x).sum).sum
    def cert(v: Array[Long]): (Long, Long, Long) = {
      val sw = xs.map { row =>
        val wq = idiv((0 until 64).map(j => row(j) * v(j)).sum, 10000000L)
        wq * wq
      }.sum
      val vn = v.map(x => x * x).sum
      val denom = math.max(
        math.max(vn / 10000000L, 1L) * math.max(trace / 10000000L, 1L) / 1000000L, 1L)
      (sw, vn, sw / denom)
    }
    val (s1, vn1, e1) = cert(v1); val (s2, vn2, e2) = cert(v2)
    val got = SparkEntry.queries("q_pca_variance")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, s1, vn1, trace, e1), (2L, s2, vn2, trace, e2)),
      s"variance cert diverged: got ${got.mkString(",")}")
    // NO order assertion between e1 and e2: R(v2) ≤ R(v1) holds only when
    // v1 IS the top eigenvector, and on this near-isotropic corpus
    // (λ1/λ2 ≈ 1.017) 8 rounds leave v1 a mixture — the deflated axis can
    // legitimately edge past it (observed both ways across SFs). What IS
    // invariant: both fractions sit in the near-isotropic band above the
    // uniform 1/64 floor (~15625 e6µ) and far below dominance.
    for (e <- Seq(e1, e2))
      assert(e > 15000L && e < 100000L, s"explained fraction implausible: $e")
  }

  test("q_jl_project distortion concentrates where JL says it must") {
    val rows = SparkEntry.queries("q_jl_project")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 10, s"expected one row per query vector: ${rows.length}")
    rows.foreach { case (qid, n, mn, mx, avg) =>
      assert(n > 0 && mn > 0L && mn <= avg && avg <= mx,
        s"qid=$qid stats out of order: ($mn, $avg, $mx)")
      // Mean pairwise distortion at K=16 over hundreds of pairs sits well
      // inside [0.5, 2.0]x (single-pair std is sqrt(2/K) ~ 35%, the mean's
      // far tighter); a seeded-matrix or projection bug lands far outside.
      assert(avg >= 500000L && avg <= 2000000L,
        s"qid=$qid mean distortion off the JL concentration: $avg")
    }
  }

  test("image features come from really-decoded PNG pixels") {
    val ids = Tables.t(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val feats = SparkEntry.queries("q_multimodal_features")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(feats.keySet == ids)
    // Independent recompute straight from the generative pixel formula.
    for (id <- ids.take(20)) {
      val (w, h) = pipeline.ImageCodec.dims(id)
      val px = for (x <- 0 until w; y <- 0 until h) yield
        (pipeline.ImageCodec.r(id, x, y).toLong,
          pipeline.ImageCodec.g(id, x, y).toLong,
          pipeline.ImageCodec.b(id, x, y).toLong)
      val n = w.toLong * h
      val expect = (w.toLong, h.toLong,
        px.map(_._1).sum * 1000L / n, px.map(_._2).sum * 1000L / n,
        px.map(_._3).sum * 1000L / n)
      assert(feats(id) == expect, s"doc $id decoded stats diverged from formula")
    }
  }

  test("PNG encode -> javax.imageio decode is a pixel identity on a known image") {
    val id = 42L
    val png = pipeline.ImageCodec.encodePng(id)
    // A real PNG file: magic bytes 89 50 4E 47.
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val (w, h) = pipeline.ImageCodec.dims(id)
    assert(img.getWidth == w && img.getHeight == h)
    for (x <- 0 until w; y <- 0 until h) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == pipeline.ImageCodec.r(id, x, y), s"R($x,$y)")
      assert(((rgb >> 8) & 0xFF) == pipeline.ImageCodec.g(id, x, y), s"G($x,$y)")
      assert((rgb & 0xFF) == pipeline.ImageCodec.b(id, x, y), s"B($x,$y)")
    }
  }

  test("WAV encode -> AudioSystem decode is a sample identity on a known clip") {
    val id = 42L
    val wav = pipeline.AudioCodec.encodeWav(id)
    // A real RIFF/WAVE container: 'RIFF' .... 'WAVE'.
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == pipeline.AudioCodec.SampleRate &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian)
    val bytes = in.readAllBytes(); in.close()
    val n = pipeline.AudioCodec.nSamples(id)
    assert(bytes.length == n * 2, s"expected $n PCM16 samples, got ${bytes.length} bytes")
    for (i <- 0 until n) {
      val a = ((bytes(i * 2 + 1) << 8) | (bytes(i * 2) & 0xFF)).toShort.toInt
      assert(a == pipeline.AudioCodec.amp(id, i), s"sample $i")
    }
  }

  test("GIF encode -> frame-seeking decode is a per-frame pixel identity") {
    // Same contract as the PNG and WAV identity tests: the container
    // round-trip must be lossless (the 256-gray palette is what makes a
    // palette-based format lossless), frame COUNT must come back from the
    // container, and every frame's every pixel must equal the closed-form
    // level function — on a known id, not just in aggregate.
    // id=6 has height 4 — the regime where the JDK writer's DEFAULT
    // (interlaced) output is corrupt (rows misordered + last row zeroed);
    // the codec forces the interlace flag off, and this id pins that.
    import graft.pipeline.VideoCodec
    for (id <- Seq(6L, 7L)) {
      val gif = VideoCodec.encodeGif(id)
      assert(new String(gif.take(6), "US-ASCII").startsWith("GIF"),
        "payload is not a GIF container")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(gif))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis, false)
      assert(reader.getNumImages(true) == VideoCodec.nFrames(id))
      val (w, h) = VideoCodec.dims(id)
      for (f <- 0 until VideoCodec.nFrames(id)) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w)
          assert((img.getRGB(x, y) & 0xFF) == VideoCodec.level(id, f, x, y),
            s"id $id frame $f pixel ($x,$y) drifted")
      }
      reader.dispose(); iis.close()
    }
  }

  test("multimodal resize bounds the payload and keeps the stride contract") {
    val r = SparkEntry.queries("q_multimodal_resize")(spark, sfDir)
    val bad = r.filter(col("n_out") > 64 ||
      (col("n_in") > 0 && col("n_out") < 1) ||
      col("n_out") > col("n_in")).count()
    assert(bad == 0, "resize must emit 1..64 bytes, never more than input")
    // Payloads already <= 64 bytes pass through unchanged (stride 1).
    assert(r.filter(col("n_in") <= 64 && col("n_out") =!= col("n_in")).count() == 0,
      "small payloads must be identity-resized")
  }

  test("dedup survives corpora with short/empty documents") {
    // sequence(1, 0) is the DESCENDING array [1, 0], so an unguarded
    // shingle transform would call slice(toks, 0, 3) and crash on any doc
    // with fewer than 3 tokens (SQL arrays are 1-based). Build a corpus of
    // exactly such docs plus one near-dup pair and run every dedup query.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-short-docs").toString
    val long1 = (1 to 12).map(i => s"tok$i").mkString(" ")
    val long2 = (1 to 11).map(i => s"tok$i").mkString(" ") + " tokX"
    Seq(
      (1L, "", "en", "t", 0L),
      (2L, "one", "en", "t", 3L),
      (3L, "two words", "en", "t", 9L),
      (4L, "a b c", "en", "t", 5L),
      (5L, long1, "en", "t", long1.length.toLong),
      (6L, long2, "en", "t", long2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (q <- Seq("q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash", "q_dedup_simhash",
        // r11 sixth batch: winnowing must drop docs under W+K-1 grams
        // without calling slice on a descending sequence; the graph pair
        // (pagerank/triangles) must return an empty/clean result off this
        // corpus's tiny pair graph; the LM pair must survive 1-bigram docs.
        "q_winnow_fingerprint", "q_pagerank", "q_triangle_count",
        "q_kneser_ney", "q_pmi_collocations", "q_kcore", "q_textrank",
        "q_zipf_slope")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows != null, s"$q crashed on short docs")
    }
    // The near-dup pair among the long docs must still be found.
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngram == Set((5L, 6L)), s"expected the planted (5,6) pair, got $ngram")
  }

  test("q_sample_weighted selects heavy docs more often than uniform would") {
    import org.apache.spark.sql.functions._
    val sel = SparkEntry.queries("q_sample_weighted")(spark, sfDir).collect()
    assert(sel.length == 100, s"expected exactly k=100 rows, got ${sel.length}")
    val meanSelected = sel.map(_.getLong(1)).sum.toDouble / sel.length
    val corpusMean = Tables.t(spark, sfDir, "documents")
      .select(least(lit(1L) + expr("n_chars div 400"), lit(10L)).as("w"))
      .agg(avg(col("w"))).head().getDouble(0)
    // Priority = uniform32 div w concentrates the bottom-k on heavy docs;
    // a uniform sample's mean weight would match the corpus mean.
    assert(meanSelected > corpusMean,
      s"weighted sample mean $meanSelected <= corpus mean $corpusMean")
  }

  test("q_dedup_containment finds wrapped docs that symmetric Jaccard misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contain-docs").toString
    def doc(lo: Int, hi: Int) = (lo to hi).map(i => s"t$i").mkString(" ")
    // Doc 1 (10 shingles) is embedded verbatim at the head of doc 2 (58
    // shingles): C(1,2) = 1.0 but J = 10/58 ~ 0.17 — the wrapped-copy
    // shape Jaccard dedup structurally keeps. Doc 3 is unrelated.
    Seq(
      (1L, doc(1, 12), "en", "t", 0L),
      (2L, doc(1, 60), "en", "t", 0L),
      (3L, doc(100, 120), "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = SparkEntry.queries("q_dedup_containment")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cont.keySet == Set((1L, 2L)),
      s"expected exactly the contained->container direction, got $cont")
    assert(cont((1L, 2L)) == 1000000L, s"full containment should be 1e6: $cont")
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!ngram.contains((1L, 2L)),
      "fixture invalid: Jaccard also found the wrapped pair, so the test proves nothing")
  }

  test("q_dedup_clusters closes transitively: A~B, B~C, A!~C is one cluster") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cluster-docs").toString
    def doc(lo: Int, hi: Int) = (lo to hi).map(i => s"t$i").mkString(" ")
    // d1~d2 and d2~d3 at trigram J=7/13~0.54; d1 vs d3 at 4/16=0.25 —
    // below threshold, so only transitive closure links them.
    Seq(
      (1L, doc(1, 12), "en", "t", 0L),
      (2L, doc(4, 15), "en", "t", 0L),
      (3L, doc(7, 18), "en", "t", 0L),
      (9L, doc(50, 61), "en", "t", 0L)) // isolated: no pairs, no cluster row
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"fixture pairs: $pairs")
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"transitive closure broken: $clusters")
  }

  test("q_dedup_embedding recalls all planted cosine near-dups (vs all-pairs truth)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-dedup").toString
    val rnd = new scala.util.Random(7)
    val n = 600
    val vecs = new Array[Array[Float]](n)
    for (i <- 0 until n)
      vecs(i) =
        if (i > 50 && rnd.nextDouble() < 0.05)
          // planted near-dup: sigma-0.03 perturbation, cosine ~ 0.9995 —
          // far inside the 0.95 contract, so seeded-LSH recall is
          // deterministic (P(miss) ~ 1e-9 per pair)
          vecs(rnd.nextInt(i)).map(x => x + 0.03f * rnd.nextGaussian().toFloat)
        else Array.fill(64)(rnd.nextGaussian().toFloat)
    vecs.zipWithIndex.map { case (v, id) => (id.toLong, v.toSeq, 0) }.toSeq
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      a <- 0 until n; b <- (a + 1) until n
      if math.floor(cos(vecs(a), vecs(b)) * 1e6) >= 950000
    } yield (a.toLong, b.toLong)).toSet
    assert(truth.nonEmpty, "fixture must contain planted near-dups")
    val found = SparkEntry.queries("q_dedup_embedding")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth,
      s"missed=${(truth -- found).take(5)} spurious=${(found -- truth).take(5)}")
  }

  test("adaptive dedup-LSH geometry: occupancy-pinned width, recall-held tables") {
    import graft.pipeline.Similarity.dedupLshParams
    assert(dedupLshParams(2000L) == (8, 8),
      "sf-scale corpora must keep the original 8x8 geometry")
    val (t10, b10) = dedupLshParams(20000L)
    assert(b10 > 8 && t10 > 8, s"10x corpus must widen: got ($t10, $b10)")
    // recall at the 0.95 boundary stays >= 0.98 for every geometry
    for (nExp <- 8 to 30) {
      val (tb, bb) = dedupLshParams(1L << nExp)
      val recall = 1 - math.pow(1 - math.pow(0.899, bb), tb)
      assert(recall >= 0.98, s"N=2^$nExp ($tb tables, $bb bits): recall $recall")
      assert(bb <= 24, "signature must stay in an Int")
    }
  }

  test("pipeline plans never go quadratic (no cartesian/NLJ in dedup paths)") {
    for (q <- Seq("q_dedup_exact", "q_dedup_ngram", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_embedding", "q_fuzzy_join")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop join")
    }
  }

  test("q_fuzzy_join == all-pairs levenshtein truth; planted edits land at exact distances") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy-docs").toString
    // Keys are the rpad-20 prefix. Planted family around doc 1's key
    // "alpha beta gamma del": substitution (d=1), two edits (d=2), a
    // 3-edit indel mix (d=3, shifts every later char — the case the
    // shift-window probing exists for), and a 4-edit string that must NOT
    // pair with doc 1 (but sits at d<=3 of the d=3 variant — found via
    // its own probes).
    Seq(
      (1L, "alpha beta gamma delta", "en", "t", 0L),
      (2L, "alpha beta gamma delta", "en", "t", 0L), // d(1,2)=0
      (3L, "alpha bXta gamma delta", "en", "t", 0L), // d(1,3)=1
      (4L, "aXpha bYta gamma delta", "en", "t", 0L), // d(1,4)=2
      (5L, "lpha bXta gaYmma delta", "en", "t", 0L), // head del + sub + mid ins: d(1,5)=3
      (6L, "wholly unrelated text here", "en", "t", 0L),
      (7L, "ZZpha bYta Xamma delta", "en", "t", 0L)) // d(1,7)=4: excluded
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_fuzzy_join")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // Independent truth: all pairs, real levenshtein on the same keys.
    val keyed = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), rpad(substring(col("text"), 1, 20), 20, "~").as("k"))
    val truth = keyed.as("a").crossJoin(keyed.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.k"), col("b.k")).cast("long").as("dist"))
      .filter(col("dist") <= 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == truth,
      s"segment-filtered join diverged from truth: got $got want $truth")
    assert(got((1L, 2L)) == 0L && got((1L, 3L)) == 1L &&
      got((1L, 4L)) == 2L && got((1L, 5L)) == 3L, s"planted distances: $got")
    assert(!got.contains((1L, 7L)), s"d=4 pair must be excluded: $got")
  }

  test("q_fuzzy_join finds every randomly-edited twin (batched adversarial edits)") {
    import spark.implicits._
    // 120 random high-entropy keys, each with a twin at 1..3 random edits
    // (subs, inserts, deletes at random positions — deletions shift every
    // later character, the case the shift-window probing must absorb).
    // Truth is recomputed all-pairs below, so the assert covers both the
    // planted twins and any accidental cross-pair.
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def randKey(): String = Array.fill(20)(alpha(rnd.nextInt(26))).mkString
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var id = 0L
    for (_ <- 0 until 120) {
      val base = randKey()
      var t = base
      for (_ <- 0 until 1 + rnd.nextInt(3)) {
        val pos = rnd.nextInt(math.max(t.length, 1))
        rnd.nextInt(3) match {
          case 0 => t = t.updated(pos, alpha(rnd.nextInt(26)))
          case 1 => t = t.take(pos) + alpha(rnd.nextInt(26)) + t.drop(pos)
          case _ if t.length > 1 => t = t.take(pos) + t.drop(pos + 1)
          case _ => ()
        }
      }
      rows += ((id, base, "en", "t", 0L)); rows += ((id + 1, t, "en", "t", 0L))
      id += 2
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy-rand").toString
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val keyed = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), rpad(substring(col("text"), 1, 20), 20, "~").as("k"))
    val truth = keyed.as("a").crossJoin(keyed.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.k"), col("b.k")).cast("long").as("dist"))
      .filter(col("dist") <= 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val got = SparkEntry.queries("q_fuzzy_join")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // Some twins legitimately exceed tau at KEY level: an insert near the
    // head pushes the tail past the 20-char truncation, adding tail edits.
    assert(truth.size >= 80, s"fixture should retain most twin pairs, got ${truth.size}")
    assert(got == truth,
      s"missed=${(truth.keySet -- got.keySet).take(5)} extra=${(got.keySet -- truth.keySet).take(5)}")
  }

  test("q_fuzzy_join matches all-pairs truth on the real corpus") {
    val keyed = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), rpad(substring(col("text"), 1, 20), 20, "~").as("k"))
    val truth = keyed.as("a").crossJoin(keyed.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.k"), col("b.k")).cast("long").as("dist"))
      .filter(col("dist") <= 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val got = SparkEntry.queries("q_fuzzy_join")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(truth.nonEmpty, "corpus should contain close key pairs")
    assert(got == truth, s"got ${got.size} pairs, truth ${truth.size}")
  }

  test("q_dedup_keep_best keeps each cluster's longest member") {
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val toks = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = clusters.groupBy(_._2).map { case (cl, members) =>
      val ids = members.map(_._1)
      cl -> (ids.maxBy(id => (toks(id), -id)), ids.size.toLong)
    }
    val got = SparkEntry.queries("q_dedup_keep_best")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.nonEmpty, "corpus should contain clusters")
    assert(got == expected, s"survivor rule diverged: got $got want $expected")
  }

  test("q_split_leakage_safe: no near-dup pair straddles a split boundary") {
    // The leakage contract itself, asserted from two independent outputs:
    // every verified near-dup pair (q_dedup_ngram, exact Jaccard >= 0.5)
    // must land in ONE split — the eval-contamination channel a plain
    // per-document split leaves open. Plus: unclustered docs split exactly
    // like q_sample_split would (the rule degrades to the plain split),
    // and all three splits are populated.
    val split = SparkEntry.queries("q_split_leakage_safe")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"leak: pair ($a, $b) split as (${split(a)}, ${split(b)})")
    }
    val clustered = SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    def plainSplit(id: Long): String = {
      val b = (id * 40503L) % 65536L % 10L
      if (b < 8) "train" else if (b == 8) "valid" else "test"
    }
    split.filterNot { case (id, _) => clustered(id) }.foreach { case (id, sp) =>
      assert(sp == plainSplit(id), s"unclustered doc $id must split plainly")
    }
    assert(split.values.toSet == Set("train", "valid", "test"),
      s"all splits populated: ${split.values.toSet}")
  }

  test("q_phash_dedup pairs identical images and isolates the rest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phash-docs").toString
    // The generative image is periodic in doc_id with period
    // lcm(13, 7, 256) = 23296 (dims mod 13/7; channels mod 256 with odd
    // multipliers), so ids 5 and 23301 render byte-identical PNGs —
    // a genuine duplicate image pair under distinct ids.
    Seq((5L, "a", "en", "t", 0L), (23301L, "b", "en", "t", 0L),
      (7L, "c", "en", "t", 0L), (9L, "d", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_phash_dedup")(spark, dir)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)), x.getLong(5))).toMap
    assert(r(5L)._1 == r(23301L)._1, "identical images must hash identically")
    assert(r(5L)._2 == 1L && r(23301L)._2 == 1L,
      s"dup pair neighbor counts: ${r(5L)._2}, ${r(23301L)._2}")
    assert(r(7L)._2 == 0L && r(9L)._2 == 0L,
      s"unrelated images must be isolated: ${r(7L)}, ${r(9L)}")
  }

  test("q_dedup_semantic prunes a planted near-dup and keeps isolated vectors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    // Pairwise-orthogonal basis vectors (e_{3i}): every non-dup cosine is
    // exactly 0, far under eps=0.35, so survival is guaranteed by
    // construction rather than by a random margin.
    def basis(i: Int): Array[Float] = {
      val v = new Array[Float](64); v(3 * i) = 0.5f; v
    }
    val base = (0 until 20).map(i => (i.toLong, basis(i), 0))
    // vec 17 := vec 12 + tiny noise on its spike: cosine ~ 0.9999, same
    // cluster, so exactly one of the pair must be pruned.
    val dup = base.map {
      case (17L, _, l) =>
        val v = basis(12); v(36) = v(36) + 0.001f; v(37) = 0.002f
        (17L, v, l)
      case row => row
    }
    dup.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(3))).toMap
    assert(r.size == 20, s"every vector classified: ${r.size}")
    assert(r(12L)._1 == r(17L)._1, "planted dup pair must share a cluster")
    assert(r(12L)._2 + r(17L)._2 == 1L,
      s"exactly one of the dup pair survives: 12=${r(12L)} 17=${r(17L)}")
    val othersPruned = r.collect {
      case (id, (_, 0L)) if id != 12L && id != 17L => id }
    assert(othersPruned.isEmpty, s"isolated vectors pruned: $othersPruned")
  }

  test("q_quality_gopher matches an independent sliding-window brute force") {
    // Independent reimplementation with plain Scala collections (no Spark
    // expressions shared with the query): per doc, per n, count every
    // n-gram by sliding window, then apply the documented char-mass
    // accounting and tie-break. Exact equality on the whole corpus.
    def fracs(text: String): (Long, Long, Long, Long, Long) = {
      val toks = text.split(" ", -1)
      val total = text.length.toLong
      def gramCounts(n: Int): Map[String, Int] =
        if (toks.length < n) Map.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (g, o) => g -> o.size }
      def top(n: Int): Long = {
        val c = gramCounts(n)
        if (c.isEmpty) 0L
        else {
          // count desc, gram length desc, lexicographic asc
          val (g, cnt) = c.toSeq.sortBy { case (g, k) => (-k, -g.length, g) }.head
          math.floor(cnt.toLong * g.length * 1e6 / total).toLong
        }
      }
      def dup(n: Int): Long = {
        val chars = gramCounts(n).collect {
          case (g, k) if k >= 2 => k.toLong * g.length }.sum
        math.floor(chars * 1e6 / total).toLong
      }
      (top(2), top(3), top(4), dup(5), dup(10))
    }
    val want = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> fracs(r.getString(1))).toMap
    val got = SparkEntry.queries("q_quality_gopher")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
          r.getBoolean(6))).toMap
    assert(got.keySet == want.keySet, "one row per document")
    for ((id, (f, keep)) <- got) {
      assert(f == want(id), s"doc $id: got $f want ${want(id)}")
      val (t2, t3, t4, d5, d10) = f
      assert(keep == (t2 <= 200000 && t3 <= 180000 && t4 <= 160000 &&
        d5 <= 150000 && d10 <= 100000), s"doc $id keep flag")
    }
    // The corpus must exercise both outcomes or the gate is vacuous.
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "corpus should contain both kept and flagged docs")
  }

  test("q_hybrid_retrieval fuses consistently and honors both retrievers") {
    val out = SparkEntry.queries("q_hybrid_retrieval")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10, s"top-10 contract: ${out.length}")
    assert(out.map(_._1).distinct.length == 10, "no duplicate doc_ids")
    // Internal consistency: rrf_e6 must be recomputable from the emitted
    // ranks (absent-from-list encoded as rank 0 contributing 0).
    def c(r: Long) = if (r > 0) math.floor(1e6 / (60 + r)).toLong else 0L
    for ((id, lex, sem, rrf) <- out) {
      assert(lex >= 0 && lex <= 50 && sem >= 0 && sem <= 50, s"doc $id ranks")
      assert(rrf == c(lex) + c(sem), s"doc $id rrf_e6 mismatch")
      assert(lex > 0 || sem > 0, s"doc $id in neither list")
    }
    // The fused list is rrf-descending with doc_id tie-break.
    val key = out.map(t => (-t._4, t._1)).toSeq
    assert(key == key.sorted, "output must be (rrf desc, doc_id) ordered")
    // Both retrievers contribute rows (rank-1 docs are NOT guaranteed a
    // top-10 fusion slot — ten both-list docs can out-sum a single-list
    // rank 1 — so membership is asserted per retriever, not per doc).
    assert(out.exists(_._2 > 0), "no lexical contribution in the fusion")
    assert(out.exists(_._3 > 0), "no semantic contribution in the fusion")
    // Cross-check the lexical rank labels against the gated q_bm25_rank
    // ordering: any fused doc with lex_rank r <= 20 must be q_bm25_rank's
    // row r (same scoring, same tie-break).
    val bm = SparkEntry.queries("q_bm25_rank")(spark, sfDir)
      .collect().map(_.getLong(0))
    for ((id, lex, _, _) <- out if lex >= 1 && lex <= bm.length)
      assert(bm(lex.toInt - 1) == id,
        s"doc $id claims lex_rank $lex but q_bm25_rank row $lex is ${bm(lex.toInt - 1)}")
  }

  test("q_bpe_train matches an independent greedy brute force over the corpus") {
    // Plain-Scala reimplementation from the paper's definition: word-freq
    // table, per-round overlapping pair counts (cnt-weighted), argmax with
    // the pinned (count desc, l, r) tie-break, greedy leftmost-first
    // non-overlapping application. No Spark, no SQL — a third independent
    // derivation alongside the DataFrame plan and the DuckDB oracle.
    val words = scala.collection.mutable.Map[String, Long]()
    Tables.t(spark, sfDir, "documents").select(col("text")).collect()
      .foreach(_.getString(0).split(" ").iterator
        .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    val got = SparkEntry.queries("q_bpe_train")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    var syms = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val expect = (1 to got.length).map { step =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, ss) <- syms; i <- 0 until ss.length - 1)
        pairs((ss(i), ss(i + 1))) = pairs.getOrElse((ss(i), ss(i + 1)), 0L) + words(w)
      val ((l, r), c) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      syms = syms.map { case (w, ss) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) { out += (l + r); i += 2 }
          else { out += ss(i); i += 1 }
        }
        w -> out.result()
      }
      (step.toLong, l, r, c)
    }
    assert(got.length >= 8, s"expected >= 8 merge rounds, got ${got.length}")
    assert(got == expect, s"merge tables diverged:\n got    $got\n expect $expect")
    // The corpus must actually exercise the interesting regime: at least
    // one learned merge has a multi-char side (a second-order merge) —
    // otherwise the application step's correctness is never load-bearing.
    assert(expect.exists(m => m._2.length > 1 || m._3.length > 1),
      s"corpus too trivial: no second-order merge in ${got.length} rounds")
    // Encode cross-check: per-doc subword totals must match re-encoding
    // every document with the brute force's FINAL segmentation (`syms`
    // after all rounds applied — the same vocabulary state w_M the
    // DuckDB gate checks via q_bpe_encode).
    val segLen = syms.map { case (w, ss) => w -> ss.length.toLong }
    val expectEnc = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ws = r.getString(1).split(" ")
          .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
        (r.getLong(0), ws.length.toLong, ws.map(segLen).sum)
      }.filter(_._2 > 0).toSet
    val gotEnc = SparkEntry.queries("q_bpe_encode")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotEnc == expectEnc,
      s"encode diverged: got ${gotEnc.size} docs, want ${expectEnc.size}")
    // The merges must actually compress: corpus-wide subwords < chars.
    val subTotal = expectEnc.toSeq.map(_._3).sum
    val charTotal = segLen.keys.map(w => w.length.toLong * words(w)).sum
    assert(subTotal < charTotal, "no compression vs character tokenization")
  }

  test("q_wordpiece_train matches a likelihood-scored brute force and diverges from BPE") {
    // Plain-Scala third derivation: same word-freq table and greedy
    // application as the BPE brute force, but the merge pick maximizes
    // the quantized likelihood score c*1e9/(sc_l*sc_r) with the pinned
    // (score desc, count desc, l, r) tie-break.
    val words = scala.collection.mutable.Map[String, Long]()
    Tables.t(spark, sfDir, "documents").select(col("text")).collect()
      .foreach(_.getString(0).split(" ").iterator
        .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    val got = SparkEntry.queries("q_wordpiece_train")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    var syms = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val expect = (1 to got.length).map { step =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      val sc = scala.collection.mutable.Map[String, Long]()
      for ((w, ss) <- syms) {
        for (s0 <- ss) sc(s0) = sc.getOrElse(s0, 0L) + words(w)
        for (i <- 0 until ss.length - 1)
          pairs((ss(i), ss(i + 1))) = pairs.getOrElse((ss(i), ss(i + 1)), 0L) + words(w)
      }
      val (l, r, c, s9) = pairs.toSeq
        .map { case ((l, r), c) => (l, r, c, c * 1000000000L / (sc(l) * sc(r))) }
        .minBy { case (l, r, c, s9) => (-s9, -c, l, r) }
      syms = syms.map { case (w, ss) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) { out += (l + r); i += 2 }
          else { out += ss(i); i += 1 }
        }
        w -> out.result()
      }
      (step.toLong, l, r, c, s9)
    }
    assert(got.length >= 8, s"expected >= 8 merge rounds, got ${got.length}")
    assert(got == expect, s"merge tables diverged:\n got    $got\n expect $expect")
    // The likelihood objective must actually pick differently than BPE's
    // raw-count objective on this corpus — otherwise the scoring rule is
    // never load-bearing.
    val bpe = SparkEntry.queries("q_bpe_train")(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got.map(t => (t._2, t._3)) != bpe,
      "fixture too trivial: wordpiece == bpe merge-for-merge")
  }

  test("q_vocab_growth matches a plain-Scala prefix recompute") {
    val rows = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val n = rows.map(_._1).max + 1
    val expect = Seq(1L, 2L, 3L, 4L).map { k =>
      val t = n / Seq(8, 4, 2, 1)(k.toInt - 1)
      val pre = rows.filter(_._1 < t)
      (k, t, pre.map(_._2.length.toLong).sum,
        pre.flatMap(_._2).distinct.length.toLong)
    }
    val got = SparkEntry.queries("q_vocab_growth")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == expect,
      s"prefix stats diverged:\n got $got\nwant $expect")
    val betas = got.flatMap(_._5)
    val eb = expect.sliding(2).map { case Seq((_, _, n0, v0), (_, _, n1, v1)) =>
      math.floor(math.log(v1.toDouble / v0) / math.log(n1.toDouble / n0) * 1e6).toLong
    }.toSeq
    assert(betas == eb, s"beta diverged: got $betas want $eb")
    // Heaps' law: sublinear vocabulary growth. The gate fixture's
    // closed synthetic vocabulary saturates early (beta == 0 between
    // later prefixes) — the benign end of the law; the pathology the
    // operator watches for is beta -> 1e6.
    betas.foreach(b => assert(b >= 0 && b < 1000000L, s"beta out of range: $b"))
  }

  test("q_dsir_select matches a brute-force importance-score recompute") {
    val B = 1024
    def bucket(tok: String): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(("graft-dsir-1:" + tok).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hx.substring(0, 8), 16) % B
    }
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).map(bucket)))
    val cr = scala.collection.mutable.Map[Long, Long]()
    val ct = scala.collection.mutable.Map[Long, Long]()
    for ((_, lang, bs) <- docs; b <- bs) {
      cr(b) = cr.getOrElse(b, 0L) + 1
      if (lang == "en") ct(b) = ct.getOrElse(b, 0L) + 1
    }
    val (nr, nt) = (cr.values.sum, ct.values.sum)
    val w = cr.keys.map { b =>
      b -> math.floor((math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + B)) -
        math.log((cr(b) + 1).toDouble / (nr + B))) * 1e6).toLong
    }.toMap
    val expect = docs.map { case (id, _, bs) => (id, bs.map(w).sum) }
      .sortBy { case (id, s) => (-s, id) }.take(100).toSeq
    val got = SparkEntry.queries("q_dsir_select")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
      .sortBy { case (id, s) => (-s, id) }
    assert(got == expect, s"selection diverged: got ${got.take(5)}... want ${expect.take(5)}...")
    // Selection contract: the selected slice is enriched in the target
    // language relative to the corpus (that is DSIR's whole point).
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val selEn = got.count { case (id, _) => langOf(id) == "en" }.toDouble / got.size
    val corpusEn = docs.count(_._2 == "en").toDouble / docs.length
    assert(selEn > corpusEn,
      f"no target enrichment: selected en-frac $selEn%.2f vs corpus $corpusEn%.2f")
  }

  test("q_hard_negatives: top-k cross-label cosine, never self, never same label") {
    val vecs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getInt(r.fieldIndex("label")),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = (for ((qid, ql, qv) <- vecs if qid < 6) yield {
      vecs.filter { case (nid, nl, _) => nid != qid && nl != ql }
        .map { case (nid, nl, nv) => (qid, nid, nl, math.floor(cos(qv, nv) * 1e6).toLong) }
        .sortBy { case (_, nid, _, s) => (-s, nid) }.take(8)
        .zipWithIndex.map { case ((q, n, l, s), i) => (q, n, l, s, (i + 1).toLong) }
    }).flatten.toSet
    val got = SparkEntry.queries("q_hard_negatives")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getAs[Number](4).longValue)).toSet
    assert(got == expect,
      s"hard negatives diverged: got ${got.size} rows, want ${expect.size}")
  }

  test("q_mmr_rerank matches a plain-Scala greedy MMR recompute") {
    val vecs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = vecs.find(_._1 == 0L).get._2
    val cands = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, math.floor(cos(qv, v) * 1e6).toLong) }
      .sortBy { case (id, _, s) => (-s, id) }.take(50)
    var picked = Vector.empty[(Long, Long, Long, Long)] // (id, rnk, rel, mmr)
    for (k <- 1 to 10) {
      val chosen = picked.map(_._1).toSet
      val next = cands.filter(c => !chosen(c._1)).map { case (id, v, rel) =>
        val ms = if (picked.isEmpty) 0L
          else picked.map { p =>
            val pv = cands.find(_._1 == p._1).get._2
            math.floor(cos(v, pv) * 1e6).toLong
          }.max
        val mmr = if (picked.isEmpty) 7L * rel else 7L * rel - 3L * ms
        (id, k.toLong, rel, mmr)
      }.minBy { case (id, _, _, mmr) => (-mmr, id) }
      picked :+= next
    }
    val got = SparkEntry.queries("q_mmr_rerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == picked.toSet,
      s"MMR diverged: got ${got.sortBy(_._2).mkString(",")} want ${picked.mkString(",")}")
    // Greedy MMR is non-increasing in rank: each later pick was available
    // earlier with an mmr no higher, and the penalty only grows.
    val byRank = got.sortBy(_._2).map(_._4)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
      s"mmr must be non-increasing: ${byRank.mkString(",")}")
  }

  test("q_triangle_count matches a plain-Scala forward algorithm") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty, "corpus plants near-dups; pair graph must exist")
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val tris = for {
      (a, b) <- pairs.toSeq
      c <- adj(b) if c > b && pairs.contains((a, c))
    } yield (a, b, c)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val expect = adj.map { case (n, nbrs) =>
      val deg = nbrs.size.toLong
      val t = perNode.getOrElse(n, 0L)
      (n, deg, t, if (deg >= 2) (2 * t * 1000000L) / (deg * (deg - 1)) else 0L)
    }.toSet
    val got = SparkEntry.queries("q_triangle_count")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"triangles diverged: got ${got.size} want ${expect.size}")
    assert(got.forall { case (_, _, _, l) => l >= 0 && l <= 1000000L },
      "LCC must be a valid e6 fraction")
  }

  test("GraphOps.integerPagerank: structural invariants on hand-built graphs") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
      pipeline.GraphOps.integerPagerank(
        edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // Triangle: full symmetry -> all three ranks identical.
    val tri = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(tri.values.toSet.size == 1, s"triangle ranks must be equal: $tri")
    // Star S4: the hub absorbs every leaf's full contribution each round
    // and must dominate; leaves are symmetric.
    val star = run(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    assert(star(10L) > star(1L), s"hub must outrank leaves: $star")
    assert(Set(1L, 2L, 3L, 4L).map(star).size == 1, s"leaves symmetric: $star")
    // Mass bound: damped redistribution cannot mint rank above the
    // initial total (1e9), and the teleport base is everyone's floor.
    val total = star.values.sum
    assert(total <= 1000000000L && star.values.forall(_ > 0), s"mass bound: $total")
  }

  test("q_kcore matches a plain-Scala peeling recompute") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg0 = edges.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    var alive = deg0.keySet
    var lastDeg: Map[Long, Long] = deg0
    for (_ <- 1 to 8) {
      lastDeg = edges.filter { case (u, v) => alive(u) && alive(v) }
        .groupBy(_._2).map { case (v, es) => v -> es.length.toLong }
      alive = lastDeg.collect { case (v, c) if c >= 2 => v }.toSet
    }
    val expect = deg0.map { case (n, d) =>
      (n, d, alive(n), if (alive(n)) lastDeg(n) else 0L)
    }.toSet
    val got = SparkEntry.queries("q_kcore")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
    assert(got == expect, s"kcore diverged: got ${got.size} want ${expect.size}")
    // Peeling can only shrink degrees, and the core test is the invariant.
    assert(got.forall { case (_, d, ic, cd) => cd <= d && (!ic || cd >= 2) })
  }

  test("q_pagerank_residual matches plain Scala and certifies convergence") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val n = deg.size.toLong
    val base = (15L * (1000000000L / n)) / 100L
    var pr: Map[Long, Long] = deg.keys.map(_ -> 1000000000L / n).toMap
    var prev = pr
    for (_ <- 1 to 8) {
      prev = pr
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum }
      pr = deg.keys.map(k =>
        k -> (base + 85L * inflow.getOrElse(k, 0L) / 100L)).toMap
    }
    val maxResid = deg.keys.map(k => math.abs(pr(k) - prev(k))).max
    val nMoving = deg.keys.count(k => pr(k) != prev(k)).toLong
    val row = SparkEntry.queries("q_pagerank_residual")(spark, sfDir).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (n, maxResid, nMoving), s"residual diverged: $row vs ($n, $maxResid, $nMoving)")
    // The q_pagerank scaladoc's claim, now measured: on near-dup-family
    // graphs the 8-round budget quiets the walk to the e9 quantum.
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L,
      s"8 rounds did not converge on the gate corpus: $row")
  }

  test("q_cc_stars replays in plain Scala, converges, and equals components") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Plain-Scala LS/SS replay with the same pinned rules.
    def largeStar(e: Set[(Long, Long)]): Set[(Long, Long)] = {
      val sym = e.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val m = sym.groupBy(_._1).map { case (v, xs) =>
        v -> math.min(xs.map(_._2).min, v) }
      sym.collect { case (v, u) if u > v => (u, m(v)) }.toSet
    }
    def smallStar(e: Set[(Long, Long)]): Set[(Long, Long)] = {
      val or = e.toSeq.map { case (a, b) => (math.max(a, b), math.min(a, b)) }
      val m = or.groupBy(_._1).map { case (hi, xs) => hi -> xs.map(_._2).min }
      (or.collect { case (hi, lo) if lo != m(hi) => (lo, m(hi)) } ++
        m.toSeq.map { case (hi, mm) => (hi, mm) }).toSet
    }
    var e: Set[(Long, Long)] = pairs
    // The query's own round budget, not a hardcoded copy (ADVICE r11):
    // a CC_CYCLES change must change this replay in lockstep.
    for (_ <- 1 to pipeline.Dedup.CC_CYCLES) { e = smallStar(largeStar(e)) }
    val expect = e.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val got = SparkEntry.queries("q_cc_stars")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"LS/SS diverged: got ${got.size} want ${expect.size}")
    // Fixpoint on this corpus: one more alternation changes nothing.
    assert(smallStar(largeStar(e)).map(p =>
      (math.min(p._1, p._2), math.max(p._1, p._2))) == expect,
      "gate corpus did not converge in 3 cycles")
    // Converged stars ARE the components: member -> root plus root -> root
    // must equal the gated hash-to-min labels.
    val labels = got.map { case (root, member) => (member, root) } ++
      got.map(_._1).map(r => (r, r))
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels == clusters,
      s"LS/SS labels diverge from components: ${labels.size} vs ${clusters.size}")
  }

  test("q_dedup_sorted_neighborhood matches plain Scala and stays inside truth") {
    // Third derivation: sort by (n_chars, doc_id), window W=8, exact
    // Jaccard on trigram shingle sets.
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sh = docs.map { case (id, t, _) =>
      id -> t.split(' ').sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val order = docs.sortBy { case (id, _, n) => (n, id) }.map(_._1)
    val expect = (for {
      i <- order.indices; k <- 1 to 8 if i + k < order.length
      (a, b) = (order(i), order(i + k))
      (sa, sb) = (sh(a), sh(b)) if sa.nonEmpty && sb.nonEmpty
      inter = sa.intersect(sb).size.toDouble
      j = inter / (sa.size + sb.size - inter) if j >= 0.5
    } yield (math.min(a, b), math.max(a, b), math.floor(j * 1e6).toLong)).toSet
    val got = SparkEntry.queries("q_dedup_sorted_neighborhood")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"SN diverged: got ${got.size} want ${expect.size}")
    // Exact verification means SN can never emit a pair outside the
    // exhaustive truth — its recall is key-limited, its precision is not.
    val truth = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(p => (p._1, p._2)).subsetOf(truth),
      "sorted-neighborhood produced a pair the exhaustive truth lacks")
    // The candidate bound the strategy exists for: at most N*W pairs were
    // ever eligible, so output cannot exceed it either.
    assert(got.size <= docs.length * 8)
  }

  test("q_lsh_tune matches a plain-Scala S-curve recompute and prices the tradeoff") {
    // Recall side off the gated true-pair spectrum; candidate side off an
    // independently rebuilt seeded shingle sample.
    val js = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(_.getLong(2).toDouble / 1e6)
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        md5(concat(lit("graft-lshtune-1:"), col("doc_id").cast("string"))).as("hx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def fold(hx: String): Long = (0 until 8).map { i =>
      ("0123456789abcdef".indexOf(hx(i)).toLong) * (1L << (4 * (7 - i)))
    }.sum
    val samp = docs.sortBy { case (id, _, hx) => (fold(hx), id) }.take(64)
      .map { case (id, t, _) =>
        val toks = t.split(' ')
        id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val bgJs = (for {
      (a, ta) <- samp; (b, tb) <- samp if a < b
    } yield {
      val inter = ta.intersect(tb).size.toDouble
      inter / (ta.size + tb.size - inter)
    }).toSeq
    // The same repeated-squaring chain, in plain Scala.
    def p(j: Double, r: Int, b: Int): Long = {
      def sq(x: Double, times: Int): Double = (1 to times).foldLeft(x)((a, _) => a * a)
      val jr = sq(j, Integer.numberOfTrailingZeros(r))
      val qb = sq(1.0 - jr, Integer.numberOfTrailingZeros(b))
      math.floor((1.0 - qb) * 1e9).toLong
    }
    val expect = Seq((2, 16), (4, 8), (8, 4), (16, 2)).map { case (b, r) =>
      val caught = js.map(p(_, r, b)).sum
      (b.toLong, r.toLong, js.length.toLong, caught,
        caught / math.max(js.length.toLong, 1L) / 1000L,
        bgJs.map(p(_, r, b)).sum)
    }.toSet
    val got = SparkEntry.queries("q_lsh_tune")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect, s"tuner diverged:\n got $got\nwant $expect")
    // The S-curve tradeoff must be monotone at fixed signature length:
    // more bands = higher expected recall AND higher background candidate
    // mass — the tuner exists to price exactly this.
    val byBands = got.toSeq.sortBy(_._1)
    assert(byBands.zip(byBands.tail).forall { case (lo, hi) =>
      lo._4 <= hi._4 && lo._6 <= hi._6 }, s"S-curve monotonicity violated: $byBands")
    // The production banding (8, 4) must clear the family's certified
    // recall floor on the observed spectrum.
    assert(got.find(x => x._1 == 8 && x._2 == 4).get._5 >= 950000L,
      "production banding under the recall contract on the observed spectrum")
  }

  test("q_label_propagation matches a plain-Scala synchronous LPA recompute") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = edges.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to pipeline.GraphOps.LPA_ROUNDS) {
      lab = adj.map { case (v, nbrs) =>
        // Pinned mode: neighbor-label counts under (count desc, label asc).
        val pick = nbrs.map(lab).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }.toSeq
          .maxBy { case (l, c) => (c, -l) }._1
        v -> pick
      }
    }
    val sizes = lab.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val expect = lab.map { case (v, l) => (v, l, sizes(l)) }.toSet
    val got = SparkEntry.queries("q_label_propagation")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"LPA diverged: got ${got.size} want ${expect.size}")
  }

  test("GraphOps.labelPropagation: bridged cliques keep distinct communities") {
    import spark.implicits._
    // Two 4-cliques {1..4} and {11..14} joined by ONE bridge (4, 11): the
    // mode rule must keep them in separate communities — the exact failure
    // mode connected components have (one spurious pair merges families).
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)) ++
      Seq((4L, 11L))).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = pipeline.GraphOps.labelPropagation(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Set(1L, 2L, 3L, 4L).map(got)
    val right = Set(11L, 12L, 13L, 14L).map(got)
    assert(left.size == 1 && right.size == 1, s"cliques must be uniform: $got")
    assert(left != right, s"bridge must not merge the cliques: $got")
  }

  test("q_textrank matches a plain-Scala power iteration on the word graph") {
    // Rebuild the graph AND the recurrence independently: adjacent-token
    // bigram types with count >= 3 (prev != cur), canonicalized
    // undirected, then the same pinned integer PageRank as q_pagerank.
    val texts = Tables.t(spark, sfDir, "documents").select(col("text")).collect()
      .map(_.getString(0).split(' ').filter(_.nonEmpty).toSeq).filter(_.length >= 2)
    val c2 = texts.flatMap(_.sliding(2).map(w => (w(0), w(1))).toSeq)
      .groupBy(identity).map { case (bg, xs) => bg -> xs.length }
    // NB: .toSeq first — .collect on a Map producing pairs would rebuild a
    // Map and silently collapse every canonical edge sharing a first token.
    val und = c2.toSeq.collect { case ((p, c), n) if n >= 3 && p != c =>
      (if (p < c) (p, c) else (c, p)) }.toSet
    assert(und.nonEmpty, "gate corpus must have a word graph")
    val edges = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val n = deg.size.toLong
    val base = (15L * (1000000000L / n)) / 100L
    var pr: Map[String, Long] = deg.keys.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 8) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum }
      pr = deg.keys.map(v => v -> (base + (85L * inflow.getOrElse(v, 0L)) / 100L)).toMap
    }
    val want = pr.toSeq.map { case (w, p) => (w, deg(w), p) }
      .sortBy { case (w, _, p) => (-p, w) }.take(20)
    val got = SparkEntry.queries("q_textrank")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy { case (w, _, p) => (-p, w) }
    assert(got == want, s"textrank diverged:\n got $got\nwant $want")
  }

  test("q_winnow_fingerprint matches a plain-Scala winnower + guarantee") {
    val K = 4; val W = 8
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def fold(h: String): Long = (0 until 8).map(i =>
      "0123456789abcdef".indexOf(h(i)).toLong * (1L << (4 * (7 - i)))).sum
    def winnow(toks: Seq[String]): Set[(Long, Long)] = {
      val m = toks.length - (K - 1)
      if (m < W) Set.empty
      else {
        val gh = (1 to m).map(i => fold(md5hex(toks.slice(i - 1, i - 1 + K).mkString(" "))))
        (1 to m - W + 1).map { j =>
          val win = gh.slice(j - 1, j - 1 + W)
          val mn = win.min
          ((j + win.lastIndexOf(mn)).toLong, mn) // rightmost-min MOSS rule
        }.toSet
      }
    }
    val corpus = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> winnow(r.getString(1).split(' ').filter(_.nonEmpty).toSeq))
    val docsPerFp = corpus.flatMap { case (id, s) => s.map(f => (f._2, id)) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
    val expect = corpus.collect { case (id, s) if s.nonEmpty =>
      (id, s.size.toLong, s.count(f => docsPerFp(f._2) >= 2).toLong)
    }.toSet
    val got = SparkEntry.queries("q_winnow_fingerprint")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"winnowing diverged: got ${got.size} want ${expect.size}")
    // The paper guarantee: two docs sharing a >= W+K-1 = 11-token run get
    // a shared fingerprint regardless of where the run sits in each doc.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    val shared = (1 to 11).map(i => s"run$i").mkString(" ")
    val a = (1 to 9).map(i => s"pre$i").mkString(" ") + " " + shared
    val b = shared + " " + (1 to 9).map(i => s"post$i").mkString(" ")
    Seq((1L, a, "en", "t", a.length.toLong), (2L, b, "en", "t", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val g = SparkEntry.queries("q_winnow_fingerprint")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g(1L) >= 1 && g(2L) >= 1,
      s"shared 11-token run must produce a shared fingerprint: $g")
  }

  test("q_pagerank matches a plain-Scala integer power iteration") {
    // Third derivation of the pinned integer recurrence; the edge list
    // comes from the independently-gated q_dedup_ngram pair set.
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus plants near-dups; pair graph must exist")
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val n = deg.size.toLong
    val base = (15L * (1000000000L / n)) / 100L
    var pr: Map[Long, Long] = deg.keys.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 8) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum }
      pr = deg.keys.map(v => v -> (base + (85L * inflow.getOrElse(v, 0L)) / 100L)).toMap
    }
    val expect = deg.keys.map(v => (v, deg(v), pr(v))).toSet
    val got = SparkEntry.queries("q_pagerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"pagerank diverged: got ${got.size} want ${expect.size}")
    // Every node holds at least the teleport mass; nobody exceeds the
    // total initial mass (damped inflow can only redistribute it).
    assert(got.forall { case (_, _, p) => p >= base && p <= 1000000000L })
  }

  test("q_semantic_outliers is the exact bottom-k of own-centroid cosine") {
    // Reuse the silhouette recompute discipline: requantize, rerun the 2
    // Lloyd rounds, then take the bottom-20 by (floor-e6 cosine, vec_id).
    val vecs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1e4)).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    var cents: Seq[(Int, Array[Double])] =
      vecs.take(pipeline.Similarity.IVF_K).map { case (id, v) => (id.toInt, v) }.toSeq
    def assign(v: Array[Double]): Int = {
      var best = 0; var i = 1
      val cs = cents.map(c => cos(v, c._2))
      while (i < cs.length) { if (cs(i) > cs(best)) best = i; i += 1 }
      best
    }
    for (_ <- 1 to 2) {
      val sums = collection.mutable.Map[Int, Array[Double]]()
      for ((_, v) <- vecs) {
        val s = sums.getOrElseUpdate(cents(assign(v))._1, new Array[Double](v.length))
        var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
      }
      cents = sums.toSeq.sortBy(_._1)
    }
    val expect = vecs.map { case (id, v) =>
      val bi = assign(v)
      (id, cents(bi)._1.toLong, math.floor(cos(v, cents(bi)._2) * 1e6).toLong)
    }.sortBy { case (id, _, c) => (c, id) }.take(20)
    val got = SparkEntry.queries("q_semantic_outliers")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(x => (x._3, x._1)).toSeq == expect.toSeq,
      s"outliers diverged:\n got ${got.mkString(",")}\nwant ${expect.mkString(",")}")
  }

  test("q_silhouette matches a plain-Scala quantized k-means recompute") {
    // Third derivation: requantize, rerun the 2 Lloyd rounds from the K
    // lowest vec_ids, then recompute the simplified silhouette per cell.
    val vecs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1e4)).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    var cents: Seq[(Int, Array[Double])] =
      vecs.take(pipeline.Similarity.IVF_K).map { case (id, v) => (id.toInt, v) }.toSeq
    def assign(v: Array[Double]): Int = {
      var best = 0; var i = 1
      val cs = cents.map(c => cos(v, c._2))
      while (i < cs.length) { if (cs(i) > cs(best)) best = i; i += 1 }
      best
    }
    for (_ <- 1 to 2) {
      val sums = collection.mutable.Map[Int, Array[Double]]()
      for ((_, v) <- vecs) {
        val s = sums.getOrElseUpdate(cents(assign(v))._1, new Array[Double](v.length))
        var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
      }
      cents = sums.toSeq.sortBy(_._1)
    }
    val per = vecs.map { case (_, v) =>
      val cs = cents.map(c => cos(v, c._2))
      val bi = assign(v)
      val cs2 = cs.zipWithIndex.collect { case (x, i) if i != bi => x }.max
      val den = math.max(1.0 - cs(bi), 1.0 - cs2)
      val s = if (den == 0.0) 0.0 else (cs(bi) - cs2) / den
      (cents(bi)._1.toLong, math.floor(s * 1e6).toLong)
    }
    val expect = per.groupBy(_._1).map { case (cl, xs) =>
      (cl, xs.length.toLong, xs.map(_._2).sum, xs.map(_._2).sum / xs.length)
    }.toSet
    val got = SparkEntry.queries("q_silhouette")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"silhouette diverged: got $got want $expect")
    // Simplified silhouette under cosine with cs1 >= cs2 is a valid
    // fraction; the corpus is random vectors, so separation is weak but
    // the coefficient must stay in range on every vector.
    assert(per.forall(p => p._2 >= 0 && p._2 <= 1000000L),
      "per-vector coefficient out of [0, 1e6]")
  }

  test("q_cluster_purity matches a plain-Scala purity/NMI recompute") {
    // Rebuild quantization + 2 Lloyd rounds + assignment independently
    // (the silhouette-spec recipe), then purity / quantized-term MI / NMI.
    val vecs = Tables.t(spark, sfDir, "embeddings").collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getInt(r.fieldIndex("label")),
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1e4)).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    var cents: Seq[(Int, Array[Double])] =
      vecs.take(pipeline.Similarity.IVF_K).map { case (id, _, v) => (id.toInt, v) }.toSeq
    def assign(v: Array[Double]): Int = {
      val cs = cents.map(c => cos(v, c._2))
      var best = 0; var i = 1
      while (i < cs.length) { if (cs(i) > cs(best)) best = i; i += 1 }
      best
    }
    for (_ <- 1 to 2) {
      val sums = collection.mutable.Map[Int, Array[Double]]()
      for ((_, _, v) <- vecs) {
        val s = sums.getOrElseUpdate(cents(assign(v))._1, new Array[Double](v.length))
        var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
      }
      cents = sums.toSeq.sortBy(_._1)
    }
    val nij = vecs.map { case (_, l, v) => (cents(assign(v))._1, l) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val ni = nij.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val nj = nij.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
    val n = nij.values.sum.toDouble
    val miE9 = nij.map { case ((c, l), x) =>
      math.floor(x / n * math.log(n * x / (ni(c).toDouble * nj(l).toDouble)) * 1e9).toLong
    }.sum
    def hE9(m: Iterable[Long]): Long =
      m.map(x => math.floor(x / n * math.log(n / x) * 1e9).toLong).sum
    val (hcE9, hlE9) = (hE9(ni.values), hE9(nj.values))
    val purE6 = nij.groupBy(_._1._1).map(_._2.values.max).sum * 1000000L / n.toLong
    val nmiE6 = if (hcE9 * hlE9 == 0L) 0L
      else math.floor(miE9.toDouble / math.sqrt(hcE9.toDouble * hlE9.toDouble) * 1e6).toLong
    val r = SparkEntry.queries("q_cluster_purity")(spark, sfDir).collect()
    assert(r.length == 1)
    val got = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4), r(0).getLong(5))
    val want = (n.toLong, purE6, miE9, hcE9, hlE9, nmiE6)
    assert(got == want, s"purity/NMI diverged: got $got want $want")
    // Random labels on random vectors: purity near 1/n_labels' complement
    // is possible, but NMI must stay a valid [0, 1e6] coefficient.
    assert(got._6 >= 0 && got._6 <= 1000000L)
  }

  test("q_cdc_dedup matches an independent plain-Scala CDC chunker") {
    // Third derivation (no Spark expressions, no SQL): boundary after
    // position i iff the 8-hex fold of md5(trailing-16-char window) is
    // 0 mod 64; chunks are the spans between cuts {0, bounds..., len};
    // a chunk is duplicated iff its md5 appears in >= 2 distinct docs.
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[String] = {
      val len = text.length
      val bounds = (16 to len).filter { i =>
        java.lang.Long.parseLong(md5hex(text.substring(i - 16, i)).take(8), 16) % 64 == 0
      }
      val cuts = (0L +: bounds.map(_.toLong) :+ len.toLong).distinct
      cuts.zip(cuts.tail).collect { case (lo, hi) if hi > lo =>
        text.substring(lo.toInt, hi.toInt)
      }
    }
    val corpus = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> chunksOf(r.getString(1)))
    val docsPerHash = corpus.flatMap { case (id, cs) => cs.map(c => (md5hex(c), id)) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
    val expect = corpus.collect { case (id, cs) if cs.nonEmpty =>
      val dup = cs.filter(c => docsPerHash(md5hex(c)) >= 2)
      (id, cs.size.toLong, dup.size.toLong, dup.map(_.length.toLong).sum)
    }.toSet
    val got = SparkEntry.queries("q_cdc_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect,
      s"CDC diverged: got ${got.size} docs, want ${expect.size}")
    // The corpus must exercise the duplication signal (planted near-dups
    // share synchronized chunks) — otherwise the dup columns are never
    // load-bearing.
    assert(expect.exists(_._3 > 0), "no duplicated chunks found in corpus")
  }

  test("q_unigram_train/encode match a plain-Scala hard-EM brute force") {
    // Third independent derivation of the unigram-LM trainer (alongside
    // the DataFrame folds and the DuckDB recursive-CTE oracle): seed
    // substring counts, vocab pick with the pinned tie-break, quantized
    // add-one log scores, Viterbi prefix/suffix DP with optimal-EDGE
    // re-estimation, two EM rounds, then the composite min-pieces encode.
    val WL = 12; val PL = 4; val SEED = 48; val MINF = -1000000000000000L
    val words = scala.collection.mutable.Map[String, Long]()
    Tables.t(spark, sfDir, "documents").select(col("text")).collect()
      .foreach(_.getString(0).split(" ").iterator
        .filter(w => w.nonEmpty && w.length <= WL &&
          w.forall(c => c >= 'a' && c <= 'z'))
        .foreach(w => words(w) = words.getOrElse(w, 0L) + 1L))
    val sub = scala.collection.mutable.Map[String, Long]()
    for ((w, c) <- words; i <- 0 until w.length; k <- 1 to PL if i + k <= w.length) {
      val p = w.substring(i, i + k)
      sub(p) = sub.getOrElse(p, 0L) + c
    }
    val multi = sub.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }.take(SEED)
    val vocab: Seq[(String, Long)] =
      ('a' to 'z').map(c => c.toString -> sub.getOrElse(c.toString, 0L)) ++ multi
    val v = vocab.size
    def scoresOf(cnts: Seq[(String, Long)]): Map[String, Long] = {
      val tot = cnts.map(_._2).sum + v
      cnts.map { case (p, c) =>
        p -> math.floor(math.log((c + 1).toDouble / tot.toDouble) * 1e6).toLong
      }.toMap
    }
    def viterbi(sc: Map[String, Long]): Map[String, Long] = {
      val out = scala.collection.mutable.Map[String, Long]() ++
        vocab.map(t => t._1 -> 0L)
      for ((w, c) <- words) {
        val L = w.length
        val pre = Array.fill(L + 1)(MINF); pre(0) = 0L
        for (j <- 1 to L; k <- 1 to math.min(PL, j))
          pre(j) = math.max(pre(j), pre(j - k) + sc.getOrElse(w.substring(j - k, j), MINF))
        val suf = Array.fill(L + 1)(MINF); suf(L) = 0L
        for (j <- L - 1 to 0 by -1; k <- 1 to math.min(PL, L - j))
          suf(j) = math.max(suf(j), sc.getOrElse(w.substring(j, j + k), MINF) + suf(j + k))
        for (i <- 0 until L; k <- 1 to math.min(PL, L - i)) {
          val p = w.substring(i, i + k)
          sc.get(p).foreach(s => if (pre(i) + s + suf(i + k) == pre(L)) out(p) += c)
        }
      }
      out.toMap
    }
    val em1 = viterbi(scoresOf(vocab))
    val em2 = viterbi(scoresOf(vocab.map { case (p, _) => p -> em1(p) }))
    val tot2 = em2.values.sum + v
    val expect = vocab.map { case (p, cs) =>
      (p, cs, em1(p), em2(p),
        math.floor(math.log((em2(p) + 1).toDouble / tot2.toDouble) * 1e6).toLong)
    }.toSet
    val got = SparkEntry.queries("q_unigram_train")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect,
      s"train diverged:\n got-only    ${(got -- expect).take(5)}\n" +
        s" expect-only ${(expect -- got).take(5)}")
    // Regime guards: a multi-char piece must survive EM (else the DP is
    // never load-bearing), and EM must actually move mass off the seed.
    assert(vocab.exists { case (p, _) => p.length >= 2 && em2(p) > 0 },
      "corpus too trivial: no multi-char piece on any optimal path")
    assert(vocab.exists { case (p, c) => em2(p) != c },
      "corpus too trivial: EM re-estimation is the identity")
    // Encode: composite DP (score*1024 - 1 per edge) => min pieces among
    // optimal-score segmentations.
    val s2 = scoresOf(vocab.map { case (p, _) => p -> em2(p) })
    def npieces(w: String): Long = {
      val L = w.length
      val plain = Array.fill(L + 1)(MINF); plain(0) = 0L
      val comp = Array.fill(L + 1)(MINF); comp(0) = 0L
      for (j <- 1 to L; k <- 1 to math.min(PL, j)) {
        val s = s2.getOrElse(w.substring(j - k, j), MINF)
        plain(j) = math.max(plain(j), plain(j - k) + s)
        comp(j) = math.max(comp(j), comp(j - k) + s * 1024L - 1L)
      }
      plain(L) * 1024L - comp(L)
    }
    val np = words.keys.map(w => w -> npieces(w)).toMap
    val expectEnc = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val ws = r.getString(1).split(" ").filter(w => w.nonEmpty &&
          w.length <= WL && w.forall(c => c >= 'a' && c <= 'z'))
        if (ws.isEmpty) None
        else {
          val ps = ws.map(np).sum
          Some((r.getLong(0), ws.length.toLong, ps, ps * 1000000L / ws.length))
        }
      }.toSet
    val gotEnc = SparkEntry.queries("q_unigram_encode")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotEnc == expectEnc,
      s"encode diverged: got ${gotEnc.size} docs, want ${expectEnc.size}")
    // The learned tokenizer must compress vs character segmentation.
    assert(np.exists { case (w, n) => n < w.length },
      "no word segments into fewer pieces than characters")
  }

  test("q_repeat_allocation matches the sequential greedy brute force") {
    // The operator computes the allocation as a prefix of the globally
    // sorted (marginal desc, source, epoch) pair list under a cumulative
    // budget. This brute force re-derives it as the LITERAL sequential
    // process — repeatedly take the highest-marginal next-epoch
    // candidate, stop at the first that overflows — proving the
    // cumulative formulation equals the sequential definition.
    val POW = Seq(1000000L, 600000L, 360000L, 216000L, 129600L, 77760L,
      46656L, 27993L)
    val SP = POW.scanLeft(0L)(_ + _)
    val src = Tables.t(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val b = src.values.sum * 2500000L / 1000000L
    val eps = scala.collection.mutable.Map[String, Int]() ++ src.keys.map(_ -> 0)
    var spent = 0L
    var done = false
    while (!done) {
      val cand = src.toSeq.filter { case (s, _) => eps(s) < POW.length }
        .map { case (s, n) => (n * POW(eps(s)) / 1000000L, s, n) }
        .sortBy { case (m, s, _) => (-m, s) }.headOption
      cand match {
        case Some((_, s, n)) if spent + n <= b => eps(s) += 1; spent += n
        case _ => done = true
      }
    }
    val ta = src.map { case (s, n) => n * eps(s) }.sum
    val expect = src.map { case (s, n) =>
      val e = eps(s)
      (s, n, e.toLong, n * e, n * SP(e) / 1000000L, n * e * 1000000L / ta)
    }.toSet
    val got = SparkEntry.queries("q_repeat_allocation")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect,
      s"allocation diverged:\n got-only    ${(got -- expect).take(5)}\n" +
        s" expect-only ${(expect -- got).take(5)}")
    // Regime guards: the budget must BIND mid-epoch-block (differentiated
    // epochs — otherwise the ordering and prefix stop are never
    // load-bearing) and repetition must actually occur.
    assert(eps.values.min < eps.values.max,
      "degenerate corpus: every source got the same epoch count")
    assert(eps.values.max >= 2, "degenerate corpus: no source is repeated")
  }

  test("q_split_leakage_cert: cluster split leaks zero pairs, per-doc split leaks") {
    val rows = SparkEntry.queries("q_split_leakage_cert")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (npDoc, crossDoc, leakDoc) = rows("per_doc")
    val (npCl, crossCl, leakCl) = rows("per_cluster")
    // Both schemes certify the same pair universe.
    assert(npDoc == npCl && npDoc > 0, s"pair universe mismatch: $rows")
    // The THEOREM the leakage-safe split exists for: zero cross-split
    // near-dup pairs, because both endpoints share a component key.
    assert(crossCl == 0L && leakCl == 0L,
      s"cluster-keyed split leaked near-dup pairs: $rows")
    // And the channel is REAL: the per-document hash split must leak on a
    // corpus with near-dups (otherwise this certificate certifies nothing).
    assert(crossDoc > 0L && leakDoc > 0L,
      s"per-doc split unexpectedly leak-free — degenerate corpus? $rows")
    // Independent recompute of the per-doc count from the gated pieces.
    val split = SparkEntry.queries("q_sample_split")(spark, sfDir) // rollup only
    assert(split.count() > 0)
    val asg = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), ((col("doc_id") * 40503L) % 65536L % 10L).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.getLong(1) < 8) "train" else if (r.getLong(1) == 8) "valid" else "test"))
      .toMap
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectCross = pairs.count { case (a, b) => asg(a) != asg(b) }
    assert(crossDoc == expectCross,
      s"per-doc cross count diverged: got $crossDoc want $expectCross")
  }

  test("materializedPairs store: reused while fresh, rebuilt on corpus regen") {
    // The graph family's shared edge store (VERDICT r11 #4): the
    // freshness contract is (a) same corpus content => the SAME persisted
    // copy backs every consumer (one discovery, seven readers), (b) an
    // in-place regen at the same path => a REBUILT store whose content
    // matches a fresh discovery — never stale edges.
    val tmp = java.nio.file.Files.createTempDirectory("graft-pairstest").toString
    def plant(n: Int): Unit =
      Tables.t(spark, sfDir, "documents").orderBy(col("doc_id")).limit(n)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      plant(40)
      val p1 = pipeline.Dedup.materializedPairs(spark, tmp, 0.5)
      val files1 = p1.inputFiles.toSet
      val set1 = pairSet(p1.select(col("a_id"), col("b_id")))
      // Fresh content => cache hit: the second call reads the same copy.
      val p2 = pipeline.Dedup.materializedPairs(spark, tmp, 0.5)
      assert(p2.inputFiles.toSet == files1,
        "same corpus content must be served from the one persisted copy")
      assert(set1 == pairSet(
        pipeline.Dedup.verifiedPairs(spark, tmp, 0.5)
          .select(col("a_id"), col("b_id"))),
        "store content diverged from a fresh discovery")
      // Regen in place (different content, same path) => token changes,
      // store rebuilds, and the content tracks the NEW corpus.
      plant(60)
      val p3 = pipeline.Dedup.materializedPairs(spark, tmp, 0.5)
      assert(p3.inputFiles.toSet != files1,
        "content change at the same path must evict the superseded copy")
      assert(pairSet(p3.select(col("a_id"), col("b_id"))) == pairSet(
        pipeline.Dedup.verifiedPairs(spark, tmp, 0.5)
          .select(col("a_id"), col("b_id"))),
        "rebuilt store diverged from a fresh discovery on the new corpus")
    } finally {
      scala.reflect.io.Path(new java.io.File(tmp)).deleteRecursively()
      ()
    }
  }

  test("bigram store: reused while fresh, rebuilt on regen, equals a fresh aggregate") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bigramtest").toString
    def plant(n: Int): Unit =
      Tables.t(spark, sfDir, "documents").orderBy(col("doc_id")).limit(n)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def fresh() = Tables.t(spark, tmp, "documents")
      .select(col("source"), expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
             i -> struct(element_at(toks, i + 1) AS prev,
                         element_at(toks, i + 2) AS cur))""")).as("bg"))
      .groupBy(col("source"), col("bg.prev"), col("bg.cur")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).toSet
    try {
      plant(30)
      val s1 = pipeline.TextAnalysis.bigramStore(spark, tmp)
      val files1 = s1.inputFiles.toSet
      assert(s1.collect().map(_.toString).toSet == fresh(),
        "store diverged from a fresh (source, prev, cur) aggregate")
      assert(pipeline.TextAnalysis.bigramStore(spark, tmp).inputFiles.toSet == files1,
        "fresh content must be served from the one persisted copy")
      plant(50)
      val s2 = pipeline.TextAnalysis.bigramStore(spark, tmp)
      assert(s2.inputFiles.toSet != files1,
        "content change at the same path must rebuild the store")
      assert(s2.collect().map(_.toString).toSet == fresh(),
        "rebuilt store diverged from the new corpus's aggregate")
    } finally {
      scala.reflect.io.Path(new java.io.File(tmp)).deleteRecursively()
      ()
    }
  }

  test("tokenizer trainer stores: reused while fresh, rebuilt on corpus regen") {
    // The BPE and unigram trainers are content-keyed stores (r12): three
    // gated consumers share one BPE train, two share one unigram EM run.
    // Contract: (a) fresh content => the same persisted word table and
    // the IDENTICAL driver-side state on every call; (b) an in-place
    // regen => both halves rebuild together (the require in bpeLearn
    // guards the merges/table pairing on the content token).
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpetest").toString
    def plant(n: Int): Unit =
      Tables.t(spark, sfDir, "documents").orderBy(col("doc_id")).limit(n)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      plant(40)
      val (m1, t1) = pipeline.TextAnalysis.bpeLearn(spark, tmp)
      val (m2, t2) = pipeline.TextAnalysis.bpeLearn(spark, tmp)
      assert(m1 == m2, "fresh content must serve one cached merge list")
      assert(t1.inputFiles.toSet == t2.inputFiles.toSet,
        "fresh content must serve one persisted word table")
      val (_, h1, s1, v1) = pipeline.Unigram.learnCore(spark, tmp)
      val (_, h2, s2, v2) = pipeline.Unigram.learnCore(spark, tmp)
      assert(h1 == h2 && s1 == s2 && v1 == v2,
        "fresh content must serve one cached EM state")
      plant(60)
      val (m3, t3) = pipeline.TextAnalysis.bpeLearn(spark, tmp)
      assert(t3.inputFiles.toSet != t1.inputFiles.toSet,
        "content change at the same path must rebuild the BPE store")
      // The rebuilt table must be the FINAL table of the rebuilt merges:
      // replaying m3 over the new corpus word table reproduces it (the
      // pairing guard, checked by content not just by token).
      val expect = t3.select(col("w"), col("cnt")).orderBy(col("w"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val fresh = Tables.t(spark, tmp, "documents")
        .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
        .filter(expr("length(translate(w, 'abcdefghijklmnopqrstuvwxyz', '')) = 0"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("w")).collect().map(r => (r.getString(0), r.getLong(1)))
      assert(expect.toSeq == fresh.toSeq,
        "rebuilt word table diverged from the new corpus's word frequencies")
      assert(m3.nonEmpty && m3.forall(_._4 > 0), "rebuilt merges malformed")
    } finally {
      scala.reflect.io.Path(new java.io.File(tmp)).deleteRecursively()
      ()
    }
  }
}
