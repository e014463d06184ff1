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
  *   - each query is timed at least TWICE and reports the min across
  *     passes (total = sum of mins), with the host's 1-min load average
  *     sampled at pass boundaries (`load_avg_start`/`load_avg_max`) —
  *     round-5's driver numbers were 10-60x off under external machine
  *     load, and round 7's single pre-run sample (1.9) hid a mid-run ramp
  *     that inflated the total 3x;
  *   - the record is SELF-PROTECTING (round-13 verdict #1: the official
  *     record was stamped during an external load storm, +38% on code
  *     that was actually faster): a bounded pre-run quiesce wait, a
  *     per-pass external-CPU-share witness (`ext_load`, via
  *     [[ExtLoadSampler]] — the 1-min load average cannot serve, our own
  *     local[32] run drives it to 3-5 on a quiet machine), up to
  *     [[BenchGate.MAX_PASSES]] passes while every pass reads
  *     contaminated, and a final `gate` verdict ("clean" iff ≥1 pass ran
  *     with external share under [[BenchGate.EXT_LOAD_GATE]]).
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

    // Page-cache witness (r14, containment attribution): /proc/self/io
    // read_bytes counts ACTUAL block-device reads — the bytes the page
    // cache could not serve. A query whose in-suite wall exceeds its
    // isolated wall while its disk_read_mb jumps is paying suite-context
    // cache turnover (245 queries' stores/spills competing for the page
    // cache), not a plan property. -1 when the platform lacks /proc.
    def diskReadBytes(): Long = try {
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/self/io")).asScala
        .collectFirst { case l if l.startsWith("read_bytes:") =>
          l.substring(l.indexOf(':') + 1).trim.toLong }
        .getOrElse(-1L)
    } catch { case _: Throwable => -1L }

    def timeOne(name: String): (Double, Long, Long, Option[String]) = {
      val g0 = gcMillis()
      val io0 = diskReadBytes()
      val t0 = System.nanoTime()
      val err = runOnce(name)
      val io1 = diskReadBytes()
      ((System.nanoTime() - t0) / 1e9, gcMillis() - g0,
        if (io0 < 0 || io1 < 0) -1L else (io1 - io0) >> 20, err)
    }
    // Legacy load-avg witness, sampled at pass boundaries — kept for
    // record continuity (start + max), but the GATE rides ext_load, which
    // our own execution cannot inflate.
    def loadNow(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Pre-run quiesce (VERDICT r13 next #1): the JVM is idle here (warmup
    // done), so system CPU ≈ external load. Wait — bounded — for the
    // machine to go quiet instead of stamping a record into a known storm.
    val quiesceT0 = System.nanoTime()
    var quiesceWaitMs = 0L
    while (BenchGate.keepQuiescing(quiesceWaitMs, ExtLoadSampler.sysCpuNow())) {
      Thread.sleep(BenchGate.QUIESCE_POLL_MS)
      quiesceWaitMs = (System.nanoTime() - quiesceT0) / 1000000L
    }
    val quiesceWaitS = math.rint(quiesceWaitMs / 100.0) / 10
    val loadStart = loadNow()
    val (heapStart, upStart, gcStart) = (heapUsedMb(), uptimeSec(), gcMillis())
    // Timed passes, min per query: a transient load spike during one pass
    // doesn't masquerade as a plan property. Two passes baseline; while
    // EVERY pass reads contaminated (mean external CPU share above the
    // gate), up to two more run — external load only inflates walls, so
    // one clean pass owns the mins and the record self-corrects instead
    // of stamping the storm (r13's +38% official record). The reported
    // gc_ms is the GC time of the pass that SET the min wall, so the two
    // columns describe the same execution.
    val passes = scala.collection.mutable.ArrayBuffer
      .empty[Map[String, (Double, Long, Long, Option[String])]]
    val extLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    var loadMax = loadStart
    while (BenchGate.needAnotherPass(extLoads.toSeq)) {
      val sampler = new ExtLoadSampler()
      passes += names.map(n => n -> timeOne(n)).toMap
      extLoads += sampler.stopAndMean()
      loadMax = math.max(loadMax, loadNow())
    }
    val gate = BenchGate.verdict(extLoads.toSeq)
    val (heapEnd, upEnd, gcEnd) = (heapUsedMb(), uptimeSec(), gcMillis())
    // Per query: the min wall across passes, with the gc/disk witnesses
    // of the pass that SET the min (so the columns describe one run).
    val timed = names.map { n =>
      val runs = passes.map(_(n))
      val (sec, gc, io, _) = runs.minBy(_._1)
      (n, sec, gc, io, runs.flatMap(_._4).headOption)
    }.toSeq

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def entry(n: String, sec: Double, err: Option[String]) =
      s"${jstr(n)}:${if (err.isDefined) -1.0 else math.rint(sec * 1000) / 1000}"
    val errs = timed.collect {
      case (n, _, _, _, Some(e)) => s"${jstr(n)}:${jstr(e)}"
    }.mkString("{", ",", "}")
    val total = math.rint(
      timed.collect { case (_, sec, _, _, None) => sec }.sum * 1000) / 1000
    val extStr = extLoads.map(e => math.rint(e * 1000) / 1000)
      .mkString("[", ",", "]")
    val witness =
      s""""gate":${jstr(gate)},"ext_load":$extStr,""" +
        s""""quiesce_wait_s":$quiesceWaitS,""" +
        s""""gc_total_ms":${gcEnd - gcStart},"gc_warmup_ms":$gcStart,""" +
        s""""heap_mb_start":$heapStart,"heap_mb_end":$heapEnd,""" +
        s""""uptime_s_start":$upStart,"uptime_s_end":$upEnd"""
    def jsonWith(qs: Seq[(String, Double, Long, Long, Option[String])],
        withDetail: Boolean = false) = {
      val m = qs.sortBy(_._1)
        .map { case (n, sec, _, _, err) => entry(n, sec, err) }
        .mkString("{", ",", "}")
      val gc = if (!withDetail) "" else qs.sortBy(_._1)
        .map { case (n, _, g, _, _) => s"${jstr(n)}:$g" }
        .mkString(""","gc_ms":{""", ",", "}")
      val io = if (!withDetail) "" else qs.sortBy(_._1)
        .map { case (n, _, _, i, _) => s"${jstr(n)}:$i" }
        .mkString(""","io_read_mb":{""", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","n":${timed.size},""" +
        s""""passes":${passes.size},""" +
        s""""load_avg_start":${math.rint(loadStart * 100) / 100},""" +
        s""""load_avg_max":${math.rint(loadMax * 100) / 100},$witness,""" +
        s""""queries":$m$gc$io,"errors":$errs,"sf":${jstr(sfDir)}}"""
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
    // Dev runs (explicit query args) print the detail maps inline — an
    // isolated-vs-in-suite witness comparison needs them, and a handful
    // of queries always fits the budget.
    var kept = timed.sortBy(-_._2)
    while (jsonWith(kept, withDetail = args.nonEmpty).length > 1800 &&
      kept.nonEmpty) kept = kept.init
    val json = jsonWith(kept, withDetail = args.nonEmpty)
    // The per-query gc_ms map rides only the durable full record below —
    // the compact driver line carries the suite-level witness fields.
    // Only FULL-suite runs write the durable per-query record: a narrowed
    // dev run (explicit query args) would otherwise litter the repo with
    // round-stamped files carrying one or two queries, and a
    // SPARK_GRAFT_ROUND-stamped narrow run would even CLOBBER the round's
    // real record.
    if (args.isEmpty) try {
      val full = jsonWith(timed, withDetail = true)
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
