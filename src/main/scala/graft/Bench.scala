package graft

/** Benchmark main — driver runs this per round at sf0.1 (BENCH_r{N}.json).
  *
  * Methodology (VERDICT.md round-1 fixes):
  *   - every query executes through the `noop` write sink, so all projected
  *     expressions actually run (a bare `count()` lets Catalyst prune the
  *     whole projection and times only the scan);
  *   - one full untimed warmup pass first (JIT, codegen cache, FS cache) —
  *     round-1 `q_select_one` at 3.8 s was pure session warmup;
  *   - failures are recorded per query as -1 with an `errors` map instead of
  *     being silently swallowed;
  *   - the JSON line is the last stdout line, printed after `spark.stop()`,
  *     so log noise can't interleave with it;
  *   - each query is timed TWICE and reports the min of the two passes
  *     (total = sum of mins), with the host's 1-min load average sampled at
  *     every pass boundary and emitted as `load_avg_start`/`load_avg_max` —
  *     round-5's driver numbers were 10-60x off under external machine
  *     load, and round 7's single pre-run sample (1.9) hid a mid-run ramp
  *     that inflated the total 3x; min-of-2 + the per-pass witness makes
  *     contamination visible instead of silently becoming the record.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()

    def runOnce(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable => Some(e.getClass.getSimpleName) }

    // Optional args: bench only the named queries (dev iteration); the
    // driver passes none and times the full suite. Unknown names abort:
    // a typo must not produce a clean-looking empty run.
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val unknown = args.toSet -- names0
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val names = if (args.isEmpty) names0 else names0.filter(args.toSet)
    names.foreach(runOnce) // warmup pass, untimed

    // GC/JVM-age witness (VERDICT r12 missing #3): end-of-suite excesses
    // were previously ATTRIBUTED to JVM age/GC pressure by inference.
    // Recording per-query GC time (delta of collector-bean totals around
    // the timed run) and heap/uptime bookends makes that attribution a
    // measurement: a query whose wall inflates while its gc_ms stays flat
    // is NOT a GC artifact.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    def heapUsedMb(): Long = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    def uptimeSec(): Long = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getUptime / 1000

    def timeOne(name: String): (Double, Long, Option[String]) = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val err = runOnce(name)
      ((System.nanoTime() - t0) / 1e9, gcMillis() - g0, err)
    }
    // Load witness, sampled per pass boundary (before pass 1, between the
    // passes, after pass 2) — round 7 proved a single pre-run sample is
    // blind to a mid-run ramp: load_avg 1.9 was recorded while the timed
    // passes ran 3x inflated. start + max makes contamination self-evident.
    def loadNow(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadNow()
    val (heapStart, upStart, gcStart) = (heapUsedMb(), uptimeSec(), gcMillis())
    // Two timed passes, min per query: a transient load spike during one
    // pass doesn't masquerade as a plan property. The reported gc_ms is
    // the GC time of the pass that SET the min wall, so the two columns
    // describe the same execution.
    val pass1 = names.map(n => n -> timeOne(n)).toMap
    val loadMid = loadNow()
    val pass2 = names.map(n => n -> timeOne(n)).toMap
    val loadMax = math.max(loadStart, math.max(loadMid, loadNow()))
    val (heapEnd, upEnd, gcEnd) = (heapUsedMb(), uptimeSec(), gcMillis())
    val timed = names.map { n =>
      val (s1, g1, e1) = pass1(n)
      val (s2, g2, e2) = pass2(n)
      (n, math.min(s1, s2), if (s1 <= s2) g1 else g2, e1.orElse(e2))
    }

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def entry(n: String, sec: Double, err: Option[String]) =
      s"${jstr(n)}:${if (err.isDefined) -1.0 else math.rint(sec * 1000) / 1000}"
    val errs = timed.collect { case (n, _, _, Some(e)) => s"${jstr(n)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = math.rint(
      timed.collect { case (_, sec, _, None) => sec }.sum * 1000) / 1000
    val witness =
      s""""gc_total_ms":${gcEnd - gcStart},"gc_warmup_ms":$gcStart,""" +
        s""""heap_mb_start":$heapStart,"heap_mb_end":$heapEnd,""" +
        s""""uptime_s_start":$upStart,"uptime_s_end":$upEnd"""
    def jsonWith(qs: Seq[(String, Double, Long, Option[String])],
        withGc: Boolean = false) = {
      val m = qs.sortBy(_._1).map { case (n, sec, _, err) => entry(n, sec, err) }
        .mkString("{", ",", "}")
      val gc = if (!withGc) "" else qs.sortBy(_._1)
        .map { case (n, _, g, _) => s"${jstr(n)}:$g" }
        .mkString(""","gc_ms":{""", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","n":${timed.size},""" +
        s""""passes":2,"load_avg_start":${math.rint(loadStart * 100) / 100},""" +
        s""""load_avg_max":${math.rint(loadMax * 100) / 100},$witness,""" +
        s""""queries":$m$gc,"errors":$errs,"sf":${jstr(sfDir)}}"""
    }
    // The driver captures only the LAST 2000 CHARS of stdout and parses the
    // tail's final line (BENCH_r1-r4 all front-truncated the full per-query
    // map -> parsed:null). Budget the line at 1800 chars: keep the slowest
    // queries' timings (plus `value` = full-suite total and `n` = suite
    // size) and shed the fastest entries until it fits. Full detail goes to
    // a round-stamped bench_full_r{N}.json (SPARK_GRAFT_ROUND, else a
    // timestamp) — the bare name was overwritten by any Bench invocation
    // from the repo cwd, which destroyed round 7's only full per-query
    // record.
    var kept = timed.sortBy(-_._2)
    while (jsonWith(kept).length > 1800 && kept.nonEmpty) kept = kept.init
    val json = jsonWith(kept)
    // The per-query gc_ms map rides only the durable full record below —
    // the compact driver line carries the suite-level witness fields.
    // Only FULL-suite runs write the durable per-query record: a narrowed
    // dev run (explicit query args) would otherwise litter the repo with
    // round-stamped files carrying one or two queries, and a
    // SPARK_GRAFT_ROUND-stamped narrow run would even CLOBBER the round's
    // real record.
    if (args.isEmpty) try {
      val full = jsonWith(timed, withGc = true)
      // No round in the env -> timestamp, so successive unstamped runs
      // (driver rounds included) never overwrite each other's record.
      val round = sys.env.get("SPARK_GRAFT_ROUND")
        .orElse(sys.env.get("GRAFT_ROUND"))
        .getOrElse(java.time.LocalDateTime.now()
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.props("user.dir"), s"bench_full_r$round.json"),
        full.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
