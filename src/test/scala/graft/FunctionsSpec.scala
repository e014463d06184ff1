package graft

import org.apache.spark.sql.functions._

/** Differential + codegen tests for graft's native Catalyst expressions. */
class FunctionsSpec extends SparkSpec {

  private def vecs = Tables.t(spark, sfDir, "embeddings")
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))

  test("graft_cosine is bit-identical to the composable HOF formulation") {
    val a = vecs.as("a")
    val b = vecs.as("b")
    val pairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") < 20)
      .select(
        call_function("graft_cosine", col("a.v"), col("b.v")).as("native"),
        pipeline.Similarity.cosineHof(col("a.v"), col("b.v")).as("hof"))
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Exact equality, not tolerance: same IEEE operation order is the
      // contract that keeps the DuckDB oracle hash-stable.
      assert(r.getDouble(0) == r.getDouble(1), s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("graft_cosine is usable from SQL via the injected function") {
    vecs.createOrReplaceTempView("fx_vecs")
    val r = spark.sql(
      """SELECT graft_cosine(a.v, a.v) AS self FROM fx_vecs a WHERE a.vec_id = 0""")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("graft_cosine null semantics: null/length-mismatch/zero-norm -> NULL") {
    val r = spark.sql(
      """SELECT
           graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n1,
           graft_cosine(array(1.0d, 2.0d), array(1.0d)) AS n2,
           graft_cosine(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS n3,
           graft_cosine(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS n4""")
      .collect().head
    assert((0 until 4).forall(r.isNullAt), r.toString)
  }

  test("graft_jaccard equals the array_intersect formulation on random sorted sets") {
    val df = spark.range(0, 2000)
      .selectExpr("id",
        "array_sort(array_distinct(transform(sequence(1, 1 + cast(id % 37 as int)), " +
          "i -> xxhash64(concat(cast(id % 13 as string), '-', cast(i % 29 as string)))))) as sa",
        "array_sort(array_distinct(transform(sequence(1, 1 + cast(id % 23 as int)), " +
          "i -> xxhash64(concat(cast(id % 7 as string), '-', cast(i % 31 as string)))))) as sb")
      .selectExpr("graft_jaccard(sa, sb) as native",
        "cast(size(array_intersect(sa, sb)) as double) / " +
          "nullif(size(sa) + size(sb) - size(array_intersect(sa, sb)), 0) as composed")
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
  }

  test("graft_overlap equals the array_intersect count on random sorted sets") {
    val df = spark.range(0, 2000)
      .selectExpr("id",
        "array_sort(array_distinct(transform(sequence(1, 1 + cast(id % 37 as int)), " +
          "i -> xxhash64(concat(cast(id % 13 as string), '-', cast(i % 29 as string)))))) as sa",
        "array_sort(array_distinct(transform(sequence(1, 1 + cast(id % 23 as int)), " +
          "i -> xxhash64(concat(cast(id % 7 as string), '-', cast(i % 31 as string)))))) as sb")
      .selectExpr("graft_overlap(sa, sb) as native",
        "cast(size(array_intersect(sa, sb)) as bigint) as composed",
        "graft_overlap(sa, sa) as self", "size(sa) as na")
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), r.toString)
      assert(r.getLong(2) == r.getInt(3).toLong, r.toString)
    }
    val nulls = spark.sql(
      """SELECT graft_overlap(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n1,
           graft_overlap(array(1L), CAST(NULL AS ARRAY<BIGINT>)) AS n2,
           graft_overlap(CAST(array() AS ARRAY<BIGINT>), array(1L, 2L)) AS z""").collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.getLong(2) == 0L)
  }

  test("graft_overlap_ge: exact for survivors, filter-equivalent for all; " +
      "early exit never flips a threshold verdict") {
    // The early-exit contract on random sorted sets across a SWEEP of
    // thresholds: for every pair and needed,
    //   - bounded >= needed  <=>  exact >= needed (the filter semantics);
    //   - bounded == exact whenever exact >= needed (survivors exact).
    // The containment verify uses needed = (4*n+4) div 5; the sweep also
    // covers 0 (bound never trips -> always exact), 1, the exact overlap
    // itself, overlap+1 (tightest non-survivor), and n+m (absurd).
    val rows = spark.range(0, 2000)
      .selectExpr("id",
        "array_sort(array_distinct(transform(sequence(1, 1 + cast(id % 37 as int)), " +
          "i -> xxhash64(concat(cast(id % 13 as string), '-', cast(i % 29 as string)))))) as sa",
        "array_sort(array_distinct(transform(sequence(1, 1 + cast(id % 23 as int)), " +
          "i -> xxhash64(concat(cast(id % 7 as string), '-', cast(i % 31 as string)))))) as sb")
      .selectExpr(
        "graft_overlap(sa, sb) as exact", "size(sa) as na", "size(sb) as nb",
        "graft_overlap_ge(sa, sb, 0L) as b0",
        "graft_overlap_ge(sa, sb, 1L) as b1",
        "graft_overlap_ge(sa, sb, (4 * size(sa) + 4) div 5) as bceil",
        "graft_overlap_ge(sa, sb, graft_overlap(sa, sb)) as bexact",
        "graft_overlap_ge(sa, sb, graft_overlap(sa, sb) + 1L) as bover",
        "graft_overlap_ge(sa, sb, cast(size(sa) + size(sb) as bigint)) as babsurd")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(0); val na = r.getInt(1)
      val needCeil = (4L * na + 4L) / 5L
      assert(r.getLong(3) == exact, s"needed=0 must walk to the end: $r")
      assert(r.getLong(4) == exact || exact == 0, s"needed=1: $r")
      // Filter equivalence + survivor exactness at the containment bound.
      val bceil = r.getLong(5)
      assert((bceil >= needCeil) == (exact >= needCeil), r.toString)
      if (exact >= needCeil) assert(bceil == exact, r.toString)
      // Tightest survivor: needed == exact -> bound never trips.
      assert(r.getLong(6) == exact, s"needed=exact must stay exact: $r")
      // Tightest non-survivor: must land strictly below needed.
      assert(r.getLong(7) <= exact && r.getLong(7) < exact + 1, r.toString)
      assert(r.getLong(8) < r.getInt(1) + r.getInt(2), s"absurd needed: $r")
    }
    // Identical-set and empty/null edges.
    val edge = spark.sql(
      """SELECT graft_overlap_ge(array(1L,2L,3L), array(1L,2L,3L), 3L) AS allhit,
           graft_overlap_ge(array(1L,2L,3L), array(4L,5L,6L), 1L) AS nohit,
           graft_overlap_ge(CAST(array() AS ARRAY<BIGINT>), array(1L), 1L) AS empt,
           graft_overlap_ge(CAST(NULL AS ARRAY<BIGINT>), array(1L), 1L) AS n1""").collect().head
    assert(edge.getLong(0) == 3L && edge.getLong(1) < 1L && edge.getLong(2) == 0L
      && edge.isNullAt(3), edge.toString)
  }

  test("graft_lsh_sigs matches the composable HOF signature formulation bit-for-bit") {
    val (tables, bits) = (16, 8)
    val flat = pipeline.Similarity.hyperplanes(tables, bits).flatten.flatten.toSeq
    val native = vecs.select(col("vec_id"), posexplode(
        call_function("graft_lsh_sigs", col("v"), typedLit(flat), lit(bits))))
      .toDF("vec_id", "table", "sig")
    val hof = vecs.select(col("vec_id"), explode(array(
        pipeline.Similarity.bucketColsHof(col("v"), tables, bits): _*)).as("bk"))
      .select(col("vec_id"), col("bk.table").as("table"), col("bk.sig").as("sig"))
    assert(native.count() == vecs.count() * tables)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native and HOF signatures diverge")
  }

  test("graft_lsh_sigs null/shape semantics") {
    val df = spark.sql(
      """SELECT graft_lsh_sigs(CAST(array(1.0, -1.0) AS array<double>),
           CAST(array(1.0, 0.0,  0.0, 1.0) AS array<double>), 2) AS s""")
    // planes: [1,0] -> dot=1 >= 0 -> bit0; [0,1] -> dot=-1 < 0. One table, sig=1.
    assert(df.head.getSeq[Int](0) == Seq(1))
    val bad = spark.sql(
      """SELECT graft_lsh_sigs(CAST(array(1.0) AS array<double>),
           CAST(array(1.0, 2.0, 3.0) AS array<double>), 2) AS s""")
    assert(bad.head.isNullAt(0), "length mismatch must yield NULL")
    val nullElem = spark.sql(
      """SELECT graft_lsh_sigs(array(1.0D, CAST(NULL AS DOUBLE)),
           CAST(array(0.5, -1.0) AS array<double>), 1) AS s""")
    assert(nullElem.head.isNullAt(0),
      "NULL element must yield NULL (graft_cosine convention)")
    val badBits = spark.sql(
      """SELECT graft_lsh_sigs(CAST(array(1.0) AS array<double>),
           CAST(array(1.0) AS array<double>), 40) AS s""")
    assert(badBits.head.isNullAt(0), "bits > 31 must yield NULL, not alias shifts")
  }

  test("graft_argmax_cos equals the composable per-centroid argmax, ties to lowest idx") {
    // Tensor = the first 6 corpus vectors flattened; every corpus vector
    // is scored against it, so vec 0..5 hit their own slot at cos = 1.
    val cents = vecs.filter(col("vec_id") < 6).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val flat = cents.flatten
    val cosArr = array(cents.toSeq.map(c =>
      call_function("graft_cosine", col("v"), lit(c))): _*)
    val r = vecs
      .withColumn("am", call_function("graft_argmax_cos", col("v"), lit(flat)))
      .withColumn("cosArr", cosArr)
      .select(col("vec_id"), col("am.idx"), col("am.cos"),
        (array_position(col("cosArr"), array_max(col("cosArr"))) - 1).cast("int"),
        array_max(col("cosArr")))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getInt(1) == row.getInt(3),
        s"vec ${row.getLong(0)}: idx ${row.getInt(1)} != composable ${row.getInt(3)}")
      assert(row.getDouble(2) == row.getDouble(4),
        s"vec ${row.getLong(0)}: cos ${row.getDouble(2)} != composable ${row.getDouble(4)}")
    }
    // Exact ties break to the LOWEST index: a tensor with the same
    // centroid twice must report slot 0, not 1.
    val dup = spark.sql(
      """SELECT graft_argmax_cos(CAST(array(1.0, 0.0) AS array<double>),
           CAST(array(1.0, 0.0, 1.0, 0.0) AS array<double>)) AS am""")
      .select(col("am.idx")).head.getInt(0)
    assert(dup == 0, s"tie must keep the first slot, got $dup")
    // Null/shape semantics: indivisible tensor, zero-norm vector, null elem.
    for (q <- Seq(
      """SELECT graft_argmax_cos(CAST(array(1.0, 2.0) AS array<double>),
           CAST(array(1.0, 2.0, 3.0) AS array<double>)) AS am""",
      """SELECT graft_argmax_cos(CAST(array(0.0, 0.0) AS array<double>),
           CAST(array(1.0, 2.0) AS array<double>)) AS am""",
      """SELECT graft_argmax_cos(array(1.0D, CAST(NULL AS DOUBLE)),
           CAST(array(1.0, 2.0) AS array<double>)) AS am"""))
      assert(spark.sql(q).head.isNullAt(0), s"expected NULL from: $q")
  }

  test("graft_argmax_cos participates in whole-stage codegen") {
    val flat = Array.fill(128)(0.25)
    // Keep `v` referenced twice so CollapseProject leaves the interpreted
    // HOF transform in its own lower Project (the graft_cosine test's
    // pattern) — the assertion targets the argmax projection itself.
    val df = vecs.select(col("v"),
      call_function("graft_argmax_cos", col("v"), lit(flat)).as("am"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[v#\\d+, graft_argmax_cos.*"), plan)
  }

  test("graft_cosine participates in whole-stage codegen") {
    val df = vecs.select(call_function("graft_cosine", col("v"), col("v")).as("s"))
    df.collect() // force execution so a codegen fallback would surface
    // The `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; the graft_cosine projection must carry it (the HOF transform
    // projection below it notably does not — that's the win).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_cosine.*"), plan)
  }

  test("graft_gopher_stats is bit-identical to the interpreted HOF fold on the corpus") {
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val both = Seq(2, 3, 4, 5, 10).foldLeft(
      base.withColumn("gs", call_function("graft_gopher_stats", col("toks")))) {
      (df, n) => df.withColumn(s"st$n", pipeline.TextAnalysis.gopherStatsHof(n))
    }
    val diff = both.filter(
      col("gs.top2c") =!= col("st2.topchars") ||
      col("gs.top3c") =!= col("st3.topchars") ||
      col("gs.top4c") =!= col("st4.topchars") ||
      col("gs.dup5c") =!= col("st5.dupchars") ||
      col("gs.dup10c") =!= col("st10.dupchars"))
    assert(both.count() > 0)
    assert(diff.isEmpty, diff.limit(5).collect().mkString("\n"))
  }

  test("graft_gopher_stats edge cases: ties, empty tokens, astral-plane order, nulls") {
    // Crafted docs: count ties broken by gram length then lexicographic;
    // empty tokens from doubled separators; supplementary characters
    // (U+10000+) where byte-wise UTF-8 order and UTF-16 code-unit order
    // could diverge if the kernel sorted Java Strings; short docs below
    // every n; a 1-token doc.
    val texts = Seq(
      "a b a b c d c d",                 // two count-2 bigrams: tie
      "aa bb aa bb cc",                  // longer-gram tiebreak
      "x  y  x  y",                      // empty tokens between doubles
      "𐀀 z 𐀀 z ￿ q", // astral (U+10000) vs BMP U+FFFF ordering
      "one",                             // below every n
      "p q",                             // exactly n=2
      "r r r r r r r r r r r r"          // one gram dominating every n
    )
    val df = spark.createDataFrame(texts.zipWithIndex.map(_.swap))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val both = Seq(2, 3, 4, 5, 10).foldLeft(
      df.withColumn("gs", call_function("graft_gopher_stats", col("toks")))) {
      (d, n) => d.withColumn(s"st$n", pipeline.TextAnalysis.gopherStatsHof(n))
    }.collect()
    both.foreach { r =>
      val gs = r.getStruct(r.fieldIndex("gs"))
      def st(n: Int, f: String) =
        r.getStruct(r.fieldIndex(s"st$n")).getAs[Long](f)
      assert(gs.getLong(0) == st(2, "topchars"), s"top2 @ ${r.get(0)}: $r")
      assert(gs.getLong(1) == st(3, "topchars"), s"top3 @ ${r.get(0)}: $r")
      assert(gs.getLong(2) == st(4, "topchars"), s"top4 @ ${r.get(0)}: $r")
      assert(gs.getLong(3) == st(5, "dupchars"), s"dup5 @ ${r.get(0)}: $r")
      assert(gs.getLong(4) == st(10, "dupchars"), s"dup10 @ ${r.get(0)}: $r")
    }
    // NULL array and NULL token slot -> NULL (graft_cosine convention).
    val nulls = spark.sql(
      """SELECT graft_gopher_stats(CAST(NULL AS ARRAY<STRING>)) AS n1,
           graft_gopher_stats(array('a', CAST(NULL AS STRING), 'b')) AS n2""")
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1), nulls.toString)
  }

  test("graft_gram_profile equals the explode-groupBy formulation on the corpus") {
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    for (n <- Seq(2, 3)) {
      val native = base.select(col("doc_id"),
        call_function("graft_gram_profile", col("toks"), lit(n)).as("p"))
        .select(col("doc_id"), col("p.n_grams"), col("p.n_distinct"), col("p.top_cnt"))
      val composed = base.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', slice(toks, i+1, $n)))"))
        .as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_cnt"))
      assert(native.count() > 0)
      assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
        s"n=$n: native and explode-groupBy profiles diverge")
    }
  }

  test("graft_gram_profile null/shape semantics") {
    val r = spark.sql(
      """SELECT
           graft_gram_profile(CAST(NULL AS ARRAY<STRING>), 2) AS n1,
           graft_gram_profile(array('a', CAST(NULL AS STRING)), 2) AS n2,
           graft_gram_profile(array('a', 'b'), 0) AS n3,
           graft_gram_profile(array('a', 'b'), 5) AS short,
           graft_gram_profile(array('a', 'b', 'a', 'b'), 2) AS p""")
      .collect().head
    assert((0 until 3).forall(r.isNullAt), r.toString)
    assert(r.getStruct(3).getLong(0) == 0L && r.getStruct(3).getLong(1) == 0L &&
      r.getStruct(3).getLong(2) == 0L, "L < n must yield (0, 0, 0)")
    // grams: "a b", "b a", "a b" -> 3 total, 2 distinct, top "a b" x2.
    assert(r.getStruct(4).getLong(0) == 3L && r.getStruct(4).getLong(1) == 2L &&
      r.getStruct(4).getLong(2) == 2L, r.getStruct(4).toString)
  }

  test("graft_winnow equals the slice/reverse/array_position HOF selection") {
    // The corpus path (real gram hashes, hexFold of md5) plus crafted tie
    // cases: equal minima in one window must pick the RIGHTMOST position,
    // and duplicate selections across windows must first-occurrence-dedup
    // exactly like array_distinct.
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .withColumn("m", (size(col("toks")) - lit(3)).cast("long"))
      .filter(col("m") >= 8)
      .withColumn("gh", expr(
        s"""transform(
              transform(sequence(1, m), i -> md5(concat_ws(' ', slice(toks, CAST(i AS INT), 4)))),
              h -> ${pipeline.Sampling.hexFold("h")})"""))
    val both = base.select(col("doc_id"),
      call_function("graft_winnow", col("gh"), lit(8)).as("native"),
      pipeline.Dedup.winnowSelHof(8).as("hof"))
    assert(both.count() > 0)
    val diff = both.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
    // Ties + duplicates: window w=3 over [5, 5, 5, 1, 1] -> windows
    // select (3, 5), (4, 1)... rightmost min each time; dedup collapses.
    val crafted = spark.sql(
      """SELECT graft_winnow(CAST(array(5, 5, 5, 1, 1) AS array<bigint>), 3) AS s""")
      .selectExpr("transform(s, x -> struct(x.pos, x.fph)) AS s").head.getSeq[org.apache.spark.sql.Row](0)
    assert(crafted.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((3L, 5L), (4L, 1L), (5L, 1L)),
      s"tie/dedup selection wrong: $crafted")
    // Null/shape semantics.
    val nulls = spark.sql(
      """SELECT graft_winnow(CAST(NULL AS array<bigint>), 3) AS n1,
           graft_winnow(array(1L, CAST(NULL AS BIGINT)), 2) AS n2,
           graft_winnow(array(1L, 2L), 0) AS n3,
           graft_winnow(array(1L, 2L), 5) AS short""").collect().head
    assert((0 until 3).forall(nulls.isNullAt), nulls.toString)
    assert(nulls.getSeq[Any](3).isEmpty, "array shorter than w must yield empty")
  }

  test("graft_gram_hashes equals xxhash64 over concat_ws gram strings") {
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 8)
    val both = base.select(col("doc_id"),
      call_function("graft_gram_hashes", col("toks"), lit(8)).as("native"),
      expr("transform(sequence(1, n - 7), i -> xxhash64(concat_ws(' ', slice(toks, i, 8))))")
        .as("hof"))
    assert(both.count() > 0)
    val diff = both.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
    val edge = spark.sql(
      """SELECT graft_gram_hashes(array('a', 'b'), 2) AS p,
           xxhash64('a b') AS x,
           graft_gram_hashes(array('a'), 2) AS short,
           graft_gram_hashes(array('a', CAST(NULL AS STRING)), 2) AS n1,
           graft_gram_hashes(CAST(NULL AS ARRAY<STRING>), 2) AS n2,
           graft_gram_hashes(array('a', 'b'), 0) AS n3""").collect().head
    assert(edge.getSeq[Long](0) == Seq(edge.getLong(1)), edge.toString)
    assert(edge.getSeq[Any](2).isEmpty, "fewer than n tokens must yield empty")
    assert((3 until 6).forall(edge.isNullAt), edge.toString)
  }

  test("graft_gram_fold_hashes equals the interpreted md5-fold transform") {
    // The retained interpreted oracle: md5 hex of each concat_ws gram,
    // folded through hexFold — exactly what q_winnow_fingerprint built
    // through r12 and what its DuckDB oracle still computes.
    val fold = pipeline.Sampling.hexFold("h")
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("toks"))
      .withColumn("m", (size(col("toks")) - 3).cast("long"))
      .filter(col("m") >= 1)
    val both = base.select(col("doc_id"),
      call_function("graft_gram_fold_hashes", col("toks"), lit(4)).as("native"),
      expr(s"""transform(
          transform(sequence(1, m), i -> md5(concat_ws(' ', slice(toks, CAST(i AS INT), 4)))),
          h -> $fold)""").as("hof"))
    assert(both.count() > 0)
    val diff = both.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
    val edge = spark.sql(
      """SELECT graft_gram_fold_hashes(array('a'), 2) AS short,
           graft_gram_fold_hashes(array('a', CAST(NULL AS STRING)), 2) AS n1,
           graft_gram_fold_hashes(CAST(NULL AS ARRAY<STRING>), 2) AS n2,
           graft_gram_fold_hashes(array('a', 'b'), 0) AS n3""").collect().head
    assert(edge.getSeq[Any](0).isEmpty, "fewer than n tokens must yield empty")
    assert((1 until 4).forall(edge.isNullAt), edge.toString)
    // Multi-byte discipline: the kernel digests UTF8String BYTE spans of
    // the joined buffer — values must match the concat_ws/md5 string path
    // on 2-, 3-, and 4-byte (astral) code points and the empty token,
    // which the ASCII word-bag corpus above cannot force.
    val uni = spark.sql(
      s"""SELECT graft_gram_fold_hashes(toks, 2) AS native,
            transform(
              transform(sequence(1, size(toks) - 1),
                i -> md5(concat_ws(' ', slice(toks, CAST(i AS INT), 2)))),
              h -> $fold) AS hof
          FROM (SELECT array('é', 'ügér', '漢字', '𝄞clef', '', 'a') AS toks)""")
      .collect().head
    assert(uni.getSeq[Long](0) == uni.getSeq[Long](1),
      s"unicode byte-span digest diverged: $uni")
  }

  test("graft_cdc_bounds equals the interpreted per-position md5 window chain") {
    // The retained interpreted oracle: exactly the transform/filter chain
    // q_cdc_dedup evaluated through r13 (and what its DuckDB oracle still
    // computes from first principles).
    val fold = pipeline.Sampling.hexFold("h")
    def hofBounds(w: Int, d: Int) = expr(
      s"""IF(len < $w, CAST(array() AS array<bigint>),
           filter(
             transform(
               transform(sequence($w, len),
                 i -> md5(substring(text, i - ${w - 1}, $w))),
               (h, j) -> IF(($fold) % $d = 0,
                 CAST(j + $w AS BIGINT), CAST(0 AS BIGINT))),
             x -> x > 0))""")
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val both = base.select(col("doc_id"),
      call_function("graft_cdc_bounds", col("text"), lit(16), lit(64))
        .as("native"),
      hofBounds(16, 64).as("hof"))
    assert(both.count() > 0)
    val diff = both.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
    // Multi-byte discipline: positions and window extents are CODE
    // POINTS (substring()/length() units), which the ASCII corpus above
    // cannot force — 2-, 3-, and 4-byte (astral) code points, a
    // shorter-than-w text, the empty string, and NULL/invalid params.
    // A small window + modulus makes boundaries dense enough to compare.
    val uni = spark.sql(
      """SELECT concat('é漢𝄞', repeat('aé漢𝄞 words and more ', 40)) AS text""")
      .select(col("text"), length(col("text")).as("len"))
      .select(
        call_function("graft_cdc_bounds", col("text"), lit(5), lit(7))
          .as("native"),
        hofBounds(5, 7).as("hof"))
      .collect().head
    assert(uni.getSeq[Long](0).nonEmpty, "dense modulus must cut somewhere")
    assert(uni.getSeq[Long](0) == uni.getSeq[Long](1),
      s"unicode code-point window divergence: $uni")
    val edge = spark.sql(
      """SELECT graft_cdc_bounds('abc', 16, 64) AS short,
           graft_cdc_bounds('', 16, 64) AS empty,
           graft_cdc_bounds(CAST(NULL AS STRING), 16, 64) AS n1,
           graft_cdc_bounds('abcdef', 0, 64) AS n2,
           graft_cdc_bounds('abcdef', 16, 0) AS n3""").collect().head
    assert(edge.getSeq[Any](0).isEmpty, "shorter than w must yield empty")
    assert(edge.getSeq[Any](1).isEmpty, "empty text must yield empty")
    assert((2 until 5).forall(edge.isNullAt), edge.toString)
  }

  test("graft_cdc_bounds participates in whole-stage codegen") {
    val df = Tables.t(spark, sfDir, "documents")
      .select(call_function("graft_cdc_bounds",
        col("text"), lit(16), lit(64)).as("bounds"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_cdc_bounds.*"),
      plan)
  }

  test("graft_dsir_buckets equals the composable md5 hex fold") {
    // The retained interpreted oracle: explode non-empty tokens, md5 the
    // salted concat, fold the first 8 hex chars, mod B — exactly what the
    // kernel compiles away (VERDICT r12 #2).
    val fold = pipeline.Sampling.hexFold("hx")
    val both = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("native",
        call_function("graft_dsir_buckets", col("text"),
          lit("graft-dsir-1:"), lit(1024)))
      .withColumn("hof", expr(
        s"""transform(filter(split(text, ' '), x -> x != ''),
            tok -> (${fold.replace("hx", "md5('graft-dsir-1:' || tok)")}) % 1024L)"""))
    assert(both.count() > 0)
    val diff = both.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
    // Edges: empty text / all-space text yield empty arrays; NULL text
    // and non-positive b yield NULL; multi-byte tokens hash their UTF-8
    // bytes (the 0x20 scan is codepoint-safe).
    val edge = spark.sql(
      """SELECT graft_dsir_buckets('', 's:', 16) AS empty,
           graft_dsir_buckets('   ', 's:', 16) AS spaces,
           graft_dsir_buckets(CAST(NULL AS STRING), 's:', 16) AS n1,
           graft_dsir_buckets('a b', 's:', 0) AS n2,
           graft_dsir_buckets('héllo wörld', 'graft-dsir-1:', 1024) AS uni""")
      .collect().head
    assert(edge.getSeq[Any](0).isEmpty && edge.getSeq[Any](1).isEmpty, edge.toString)
    assert(edge.isNullAt(2) && edge.isNullAt(3), edge.toString)
    val uniOracle = spark.sql(
      s"""SELECT transform(filter(split('héllo wörld', ' '), x -> x != ''),
           tok -> (${fold.replace("hx", "md5('graft-dsir-1:' || tok)")}) % 1024L) AS o""")
      .collect().head.getSeq[Long](0)
    assert(edge.getSeq[Long](4) == uniOracle, "multi-byte token divergence")
  }

  test("graft_dsir_buckets participates in whole-stage codegen") {
    val df = Tables.t(spark, sfDir, "documents")
      .select(call_function("graft_dsir_buckets", col("text"),
        lit("graft-dsir-1:"), lit(1024)).as("b"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dsir_buckets.*"), plan)
  }

  test("graft_gopher_stats participates in whole-stage codegen") {
    val df = Tables.t(spark, sfDir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(call_function("graft_gopher_stats", col("toks")).as("gs"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_gopher_stats.*"), plan)
  }

  test("graft_gram_hashes and graft_winnow participate in whole-stage codegen") {
    // Plain split feeds the kernels (a filter() HOF in the same stage is
    // CodegenFallback and would break the span regardless of the kernels).
    val df = Tables.t(spark, sfDir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(call_function("graft_winnow",
        call_function("graft_gram_hashes", col("toks"), lit(4)), lit(8)).as("sel"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_winnow\\(graft_gram_hashes.*"),
      plan)
  }

  // ---------------------------------------------------------------- PQ ops
  // The exact HOF formulations graft_pq_encode / graft_pq_adc replaced in
  // q_ann_ivfpq (Similarity.pqArgmin / the ADC aggregate), rebuilt here as
  // the differential oracle: integer-valued doubles, left-to-right sums,
  // strict-< argmin with lowest-id ties.
  private val PQ_T_M = 8
  private val PQ_T_SD = 8
  private val PQ_T_KS = 8
  private def pqTestD2(vec: String, off: String, base: String): String =
    s"""aggregate(sequence(0, ${PQ_T_SD - 1}), CAST(0 AS DOUBLE),
        (pa, pi) -> pa +
          (element_at($vec, $off + pi + 1) - element_at(t_cb, ($base) * $PQ_T_SD + pi + 1)) *
          (element_at($vec, $off + pi + 1) - element_at(t_cb, ($base) * $PQ_T_SD + pi + 1)))"""
  private def pqTestArgmin(vec: String, off: String, mm: String): String =
    s"""aggregate(sequence(0, ${PQ_T_KS - 1}),
        named_struct('c', 0, 'bd', CAST(1e18 AS DOUBLE)),
        (acc, cc) -> IF(${pqTestD2(vec, off, s"($mm) * $PQ_T_KS + cc")} < acc.bd,
          named_struct('c', cc, 'bd', ${pqTestD2(vec, off, s"($mm) * $PQ_T_KS + cc")}),
          acc)).c"""

  test("graft_pq_encode is bit-identical to the HOF argmin formulation") {
    // Deterministic integer-valued vectors/codebook on the quantization
    // grid (components within the SEM_Q scale class), ties included: the
    // modulus keeps repeated values common enough that the lowest-id
    // tie-break is actually exercised.
    val cbFlat = (0 until PQ_T_M * PQ_T_KS * PQ_T_SD).map(i =>
      ((i * 2654435761L) % 997 - 498).toDouble)
    val df = spark.range(0, 400)
      .selectExpr(
        "id",
        s"transform(sequence(0, ${PQ_T_M * PQ_T_SD - 1}), " +
          "i -> cast(pmod(xxhash64(id, i), 997) - 498 as double)) as qv")
      .withColumn("t_cb", typedLit(cbFlat))
      .selectExpr(
        s"graft_pq_encode(qv, t_cb, $PQ_T_SD, $PQ_T_KS) as native",
        s"transform(sequence(0, ${PQ_T_M - 1}), mm -> " +
          pqTestArgmin("qv", s"mm * $PQ_T_SD", "mm") + ") as hof")
    df.collect().foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), r.toString)
    }
  }

  test("graft_pq_adc is bit-identical to the HOF lookup-sum, and both " +
      "kernels participate in whole-stage codegen") {
    val df = spark.range(0, 400)
      .selectExpr(
        s"transform(sequence(0, ${PQ_T_M * PQ_T_KS - 1}), " +
          "i -> cast(pmod(xxhash64(id, i, 7L), 100000) as double)) as dtf",
        s"transform(sequence(0, ${PQ_T_M - 1}), " +
          s"i -> cast(pmod(xxhash64(id, i, 11L), $PQ_T_KS) as int)) as codes")
      .selectExpr(
        s"graft_pq_adc(dtf, codes, $PQ_T_KS) as native",
        s"""aggregate(sequence(0, ${PQ_T_M - 1}), CAST(0 AS DOUBLE),
            (sa, sm) -> sa + element_at(dtf, sm * $PQ_T_KS + element_at(codes, sm + 1) + 1)) as hof""")
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    val codegen = spark.range(0, 4)
      .selectExpr(
        s"transform(sequence(0, ${PQ_T_M * PQ_T_SD - 1}), " +
          "i -> cast(pmod(xxhash64(id, i), 997) as double)) as qv",
        s"transform(sequence(0, ${PQ_T_M * PQ_T_KS - 1}), " +
          "i -> cast(i as double)) as dtf")
      .selectExpr(
        s"graft_pq_adc(dtf, graft_pq_encode(qv, qv, $PQ_T_SD, 1), 1) as x")
    codegen.collect()
    val plan = codegen.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_pq_adc\\(dtf.*graft_pq_encode.*"),
      plan)
  }

  test("graft_pq_encode / graft_pq_adc null and contract edges") {
    val r = spark.sql(
      s"""SELECT
           graft_pq_encode(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d), 1, 1) AS n1,
           graft_pq_encode(array(1.0d, 2.0d), array(1.0d, 2.0d), 3, 1) AS n2,
           graft_pq_encode(array(1.0d, 2.0d), array(1.0d), 1, 2) AS n3,
           graft_pq_encode(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d), 1, 1) AS n4,
           graft_pq_adc(array(1.0d, 2.0d), array(5), 2) AS n5,
           graft_pq_adc(array(1.0d, 2.0d), array(0), 0) AS n6,
           graft_pq_adc(CAST(NULL AS ARRAY<DOUBLE>), array(0), 1) AS n7,
           graft_pq_encode(array(3.0d, 4.0d), array(9.0d, 4.0d), 1, 2) AS tie_free,
           graft_pq_adc(array(10.0d, 20.0d, 30.0d, 40.0d), array(1, 1), 2) AS ok""")
      .collect().head
    assert((0 until 7).forall(r.isNullAt), r.toString)
    // argmin picks index 1 (|3-4| < |3-9| on the first subspace... vec is
    // 2 dims, sd=1 -> M=2: subspace 0 compares 3 vs {9,4} -> code 1;
    // subspace 1 uses the SAME ks=2 codebook layout: cb[(1*2+cc)*1] is out
    // of the 2-entry codebook -> the length guard (cb must be M*ks*sd = 4)
    // makes this NULL instead. Re-check: 2*2*1 = 4 != 2 -> NULL.
    assert(r.isNullAt(7), r.toString)
    assert(r.getDouble(8) == 20.0 + 40.0, r.toString)
  }

  test("graft_gram_fold_hashes participates in whole-stage codegen") {
    // The winnow build's actual composition (q_winnow_fingerprint):
    // fold-hash the grams, winnow-select the minima — one fused stage.
    val df = Tables.t(spark, sfDir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(call_function("graft_winnow",
        call_function("graft_gram_fold_hashes", col("toks"), lit(4)),
        lit(8)).as("sel"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches(
      "(?s).*\\*\\(\\d+\\) Project \\[graft_winnow\\(graft_gram_fold_hashes.*"),
      plan)
  }
}
