package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.gateway.{GatewayConfig, JobRuntime, JobStatus}

/** Multi-JVM execution lane. Everything else in this repo runs `local[N]`,
  * where driver and executors share one JVM — so serialization bugs in the
  * injected codegen expressions, the `WeightedMean` Aggregator, the Avro
  * DSv2 commit protocol, and fetches of cached blocks owned by another
  * process are structurally invisible. `local-cluster[2,4,4096]` starts an
  * in-process standalone master/worker pair that launches TWO REAL
  * EXECUTOR JVMs (no external cluster needed) — the closest single-machine
  * analog of the reference's cross-node execution
  * (`integration-tests/docker-compose.yaml` 3-node compose; remote result
  * streams `networks/tonic/src/server.rs:109-141`).
  *
  * Protocol: the representative query slice is computed FIRST on the plain
  * local session (the expected answers), that session is stopped (one
  * SparkContext per JVM), then the cluster session computes the same slice
  * and the canonicalized row sets must match exactly. Gateway semantics
  * that depend on where blocks live — ticketed paged fetch, block-loss
  * recompute detection, panic-UDF fault isolation — then run against the
  * cluster session, where the page-cached partitions belong to remote
  * executor processes. SparkSpec.session revives itself afterwards, so
  * suite ordering does not matter.
  */
class LocalClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  /** One query per family, biased toward everything that must SERIALIZE
    * across JVM boundaries: every injected codegen expression
    * (graft_lsh_sigs, graft_cosine, graft_argmax_cos, graft_jaccard), the
    * udaf()-wrapped Aggregator, the custom physical operator, the Avro
    * DSv2 writer, localCheckpoint'd blocks, HLL partial sketches, and the
    * mapPartitions PNG codec path. */
  private val slice = Seq(
    "q1_agg",                  // partial/final hash aggregate
    "q_tpch_q3",               // multi-join + agg + topk
    "q_join_broadcast",        // broadcast exchange to remote executors
    "q_window_rank",           // partitioned window
    "q_topk_per_group",        // custom SparkPlan via injected strategy
    "q_agg_custom_udaf",       // WeightedMean Aggregator serialization
    "q_sink_avro_roundtrip",   // Avro DSv2 staged-commit write from executors
    "q_ann_lsh",               // graft_lsh_sigs codegen expression
    "q_ann_ivf",               // quantized k-means + graft_argmax_cos routing
    "q_ann_incremental",       // bucketed band-store saveAsTable + probe join
    "q_dedup_minhash",         // graft_jaccard + block grid + shingle store
    "q_dedup_semantic",        // graft_cosine pair stage + localCheckpoint
    "q_asof_chunked",          // union-fed chunk window + carry join
    "q_dedup_semantic_adaptive", // corpus-derived k, wide argmax tensor
    "q_snapshot_drift",        // two-parquet-root release comparison
    "q_hopping_window_approx", // HLL sketches merged across executors
    "q_multimodal_features",   // PNG decode inside executor mapPartitions
    "q_substring_dedup",       // co-partitioned fingerprint semi join
    "q_sample_weighted",       // seeded priority sampling, global bottom-k
    "q_sketch_hll")            // profiling sketch family

  /** Engine-order-free canonical form: every output in the slice is a
    * deterministic (oracle-hashed) result, so sorted Row renderings are an
    * exact equality witness. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // Executor JVMs are launched raw by the standalone Worker (no
  // spark-submit), so they need the same JDK17 module opens the forked
  // driver JVM gets from build.sbt.
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  private var expected: Map[String, Seq[String]] = _
  private var cluster: SparkSession = _

  override def beforeAll(): Unit = {
    val local = SparkSpec.session
    expected = slice.map(n => n -> canon(SparkEntry.queries(n)(local, sfDir))).toMap
    local.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // The local expected-pass above also fires the grid witness; clear it
    // so the telemetry test below proves the CLUSTER path, not a leftover.
    Sessions.gridDecisions.remove(graft.pipeline.Dedup.GRID_METRIC_PREFIX + "minhash")
    val b = SparkSession.builder()
      .master("local-cluster[2,4,4096]")
      .config("spark.executor.memory", "3g")
      // The graft classes (and everything else this JVM can see) must be
      // on the executor JVMs' classpath; the Spark distribution itself
      // comes from $SPARK_HOME/jars via the launcher.
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
    cluster = Sessions.configure(b, "8").getOrCreate()
    cluster.sparkContext.setLogLevel("WARN")
    Sessions.registerGridWitness(cluster) // + graft_wmean registration
    gateway.Udfs.register(cluster)
    // Barrier until both executor JVMs have registered and run tasks (also
    // fails fast here, not in some mid-slice query, if launch is broken).
    assert(cluster.range(0, 64, 1, 8).count() == 64)
  }

  override def afterAll(): Unit =
    if (cluster != null) cluster.stop() // SparkSpec.session revives lazily

  test("the slice really runs on two remote executor JVMs") {
    val infos = cluster.sparkContext.statusTracker.getExecutorInfos
    // getExecutorInfos includes the driver entry; 2 workers => 3 total.
    assert(infos.length == 3, s"expected driver + 2 executors, got ${infos.length}")
  }

  slice.foreach { name =>
    test(s"cluster == local: $name") {
      assert(canon(SparkEntry.queries(name)(cluster, sfDir)) == expected(name),
        s"$name diverged between local[8] and local-cluster execution")
    }
  }

  test("grid occupancy telemetry flows from remote executors to the registry") {
    // The occupancy witness is an observe() (CollectMetrics) whose partial
    // aggregates are computed IN executor JVMs and merged on the driver's
    // listener bus — the telemetry path the decision layer (and the
    // grid_decisions view) depends on. The slice above ran
    // q_dedup_minhash on the cluster session; its decision must have
    // landed.
    val metric = graft.pipeline.Dedup.GRID_METRIC_PREFIX + "minhash"
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var d: graft.pipeline.Dedup.GridDecision = null
    while (d == null && System.nanoTime() < deadline) {
      d = Sessions.gridDecisions.get(metric)
      if (d == null) Thread.sleep(50)
    }
    assert(d != null, "no grid decision arrived from the cluster run")
    assert(d.regime == "linear" && d.maxBucket > 0,
      s"unexpected decision from the cluster run: $d")
  }

  test("gateway ticketed fetch drains partitions cached on remote executors") {
    val rt = new JobRuntime(cluster, GatewayConfig())
    try {
      val h = rt.submit("SELECT id, id * 2 AS twice FROM range(0, 1000, 1, 4)")
      assert(h.tickets.size == 4)
      val rows = h.fetchAll()
      assert(rows.size == 1000)
      assert(rows.map(_.getLong(1)).sum == (0L until 1000L).map(_ * 2).sum)
      assert(h.status == JobStatus.Completed)
      assert(rt.liveJobIds.isEmpty)
    } finally rt.close()
  }

  test("block-loss recompute guard holds when the lost block was remote") {
    val rt = new JobRuntime(cluster, GatewayConfig(fetchPageSize = 100))
    try {
      val h = rt.submit("SELECT id FROM range(0, 10000, 1, 1)")
      val s = h.fetchStream(h.tickets.head)
      assert(s.take(150).map(_.getLong(0)).toVector == (0L until 150L).toVector)
      h.simulateBlockLoss()
      intercept[gateway.PartitionRecomputeException] { while (s.hasNext) s.next() }
      s.close()
      // Recoverable: a fresh fetch is self-consistent.
      assert(h.fetch(h.tickets.head).size == 10000)
      assert(h.status == JobStatus.Completed)
    } finally rt.close()
  }

  test("structured streaming runs its stateful aggregation on remote executors") {
    // Watermarked windowed counts through a MemoryStream on the cluster
    // session: the stateful aggregation's state store partitions live in
    // executor JVMs (HDFSBackedStateStore under the shared local FS), the
    // surface local[n] can't exercise. Same data/asserts as
    // StreamingSpec's first test's head.
    // cluster is a var; implicits need a stable path.
    val c = cluster
    implicit val sqlCtx = c.sqlContext
    import c.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[graft.streaming.EventRow]
    val q = graft.streaming.EventStream
      .startWindowedQuery(cluster, input.toDF(), "lc_win_counts")
    try {
      def ts(min: Int, sec: Int): java.sql.Timestamp =
        java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")
      input.addData(
        graft.streaming.EventRow(1, ts(0, 10), 1, "click", 1.0),
        graft.streaming.EventRow(2, ts(0, 40), 2, "click", 2.0),
        graft.streaming.EventRow(3, ts(1, 10), 1, "view", 3.0))
      q.processAllAvailable()
      val got = cluster.sql("SELECT event_type, n FROM lc_win_counts")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("click" -> 2L, "view" -> 1L), s"windowed counts: $got")
    } finally q.stop()
  }

  test("panic() in a remote executor fails the job, not the service") {
    val rt = new JobRuntime(cluster, GatewayConfig())
    try {
      val h = rt.submit("SELECT panic() FROM range(0, 10)")
      intercept[Exception] { h.fetchAll() }
      assert(h.status.isInstanceOf[JobStatus.Failed])
      // The executor JVM that threw is still serving: follow-up succeeds.
      val h2 = rt.submit("SELECT 1 AS one")
      assert(h2.fetchAll().map(_.getInt(0)) == Seq(1))
    } finally rt.close()
  }
}
