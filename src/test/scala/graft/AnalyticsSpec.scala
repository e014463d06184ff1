package graft

import org.apache.spark.sql.functions._

/** The Analytics queries' semantic contracts beyond the oracle gate:
  * the HLL registers actually estimate, and the LATERAL top-k plan is a
  * decorrelated window, not a per-outer-row re-scan. */
class AnalyticsSpec extends SparkSpec {

  test("HLL registers yield an estimate within 10% of the true cardinality") {
    val regs = SparkEntry.queries("q_sketch_hll")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = 256
    // Standard HLL estimator: alpha_m * m^2 / sum(2^-rho), empty buckets
    // contribute 2^0; linear-counting correction for the small range.
    val invSum = (0 until m).map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / invSum
    val zeros = (0 until m).count(b => !regs.contains(b.toLong))
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    val truth = Tables.t(spark, sfDir, "customer")
      .select(countDistinct(col("c_custkey"))).head.getLong(0)
    // HLL-256's theoretical standard error is 1.04/sqrt(256) = 6.5%;
    // at this corpus the linear-counting range applies (~3% observed).
    val err = math.abs(est - truth) / truth
    assert(err < 0.10, s"HLL estimate $est vs true $truth (err $err)")
  }

  test("LATERAL top-k decorrelates to a ranked window, not a re-scan join") {
    val df = SparkEntry.queries("q_lateral")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // Spark decorrelates the LATERAL into a ranked-window filter; our
    // WindowTopKRewrite then composes on top and replaces that window with
    // the heap-based TopKPerGroup (round 5) — either is the decorrelated
    // shape, never a per-row re-scan join.
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit") ||
      plan.contains("TopKPerGroup"),
      s"expected decorrelated window/top-k plan:\n$plan")
    // Exactly 2 suppliers per nation that has any supplier.
    val counts = df.groupBy(col("n_name")).count().collect()
    assert(counts.forall(_.getLong(1) <= 2))
  }

  test("the portable avalanche mix is a bijection mod 2^32") {
    // Each round (odd multiply mod 2^32, x ^ (x >> k)) is invertible, so
    // the composition must be too — no hash collisions below 2^32 keys,
    // which is what makes the register distribution analyzable. Verified
    // empirically over a contiguous key range (the corpus shape) plus a
    // scattered one.
    def mix(k: Long): Long = {
      val M = 1L << 32
      val a = (k * 2654435761L) % M
      val b = a ^ (a >> 16)
      val c = (b * 2146121005L) % M
      val e = c ^ (c >> 13)
      val f = (e * 1540483477L) % M
      f ^ (f >> 16)
    }
    val dense = (0L until 100000L).map(mix)
    assert(dense.distinct.size == dense.size, "collision in dense range")
    val scattered = (0L until 100000L).map(i => mix(i * 7919L % (1L << 32)))
    assert(scattered.distinct.size == scattered.size, "collision in scattered range")
    // And the Scala reference agrees with the SQL the oracle checks.
    Tables.register(spark, sfDir, "customer")
    val sqlRegs = spark.sql(operators.Analytics.hllSparkSql)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truthKeys = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val refRegs = truthKeys.map(mix).groupBy(_ % 256).view.mapValues { hs =>
      hs.map { h =>
        val p = h / 256
        if (p == 0) 25L else java.lang.Long.numberOfTrailingZeros(p) + 1L
      }.max
    }.toMap
    assert(sqlRegs == refRegs, "SQL registers diverge from the Scala reference")
  }

  test("merging partial HLL sketches = element-wise register MAX") {
    // Split the corpus in half, sketch each, merge via max — must equal
    // the single-pass sketch (the property that makes HLL distributable).
    val c = Tables.t(spark, sfDir, "customer")
    // The exact production SQL, pointed at a half-corpus view. The view
    // must be dropped afterwards: the session is JVM-shared across all
    // suites, and a leaked "customer" bound to a half-corpus filter would
    // silently halve any later unqualified `FROM customer`.
    def sketch(dfq: org.apache.spark.sql.DataFrame) = {
      dfq.createOrReplaceTempView("customer")
      try spark.sql(operators.Analytics.hllSparkSql)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.catalog.dropTempView("customer")
    }
    val whole = sketch(c)
    val lo = sketch(c.filter(col("c_custkey") % 2 === 0))
    val hi = sketch(c.filter(col("c_custkey") % 2 === 1))
    val merged = (lo.keySet ++ hi.keySet).map(b =>
      b -> math.max(lo.getOrElse(b, 0L), hi.getOrElse(b, 0L))).toMap
    assert(merged == whole)
  }
}
