package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, sha2}
import graft.streaming.{EventStream, EventRow}

/** Structured Streaming layer: event-time windowed aggregation with
  * watermarking (late-data drop) and stateful sessionization, driven
  * through a MemoryStream the way a kafka/file source would feed it.
  */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  test("windowed counts advance with the watermark and drop late events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val q = EventStream.startWindowedQuery(spark, input.toDF(), "win_counts")
    try {
      input.addData(
        EventRow(1, ts(0, 10), 1, "click", 1.0),
        EventRow(2, ts(0, 40), 2, "click", 2.0),
        EventRow(3, ts(1, 10), 1, "view", 3.0))
      q.processAllAvailable()
      val afterFirst = spark.sql(
        "SELECT event_type, n FROM win_counts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(afterFirst == Map("click" -> 2L, "view" -> 1L))

      // Advance event time past the watermark (10:01:10 + 2 min), then send
      // an event for the long-closed 10:00 window -> must be dropped.
      input.addData(EventRow(4, ts(5), 3, "click", 4.0))
      q.processAllAvailable()
      input.addData(EventRow(5, ts(0, 50), 9, "click", 5.0)) // late
      q.processAllAvailable()
      val afterLate = spark.sql(
        "SELECT sum(n) FROM win_counts WHERE event_type = 'click'").collect()
        .head.getLong(0)
      assert(afterLate == 3L, "late event leaked past the watermark")
    } finally q.stop()
  }

  test("hopping windows: each event lands in k=5 sliding windows, sketched users") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val q = EventStream.hoppingCounts(input.toDF())
      .writeStream.format("memory").queryName("hop_counts")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // One batch (update-mode memory sink would otherwise hold multiple
      // versions of a window across batches).
      input.addData(
        EventRow(1, ts(0, 10), 1, "click", 1.0),
        EventRow(2, ts(0, 40), 2, "click", 2.0),
        EventRow(3, ts(1, 10), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n, n_users_approx FROM hop_counts")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      // 3 events x 5 covering windows each = 15 memberships.
      assert(rows.map(_._2).sum == 15, s"memberships wrong: ${rows.toSeq}")
      // The 10:00 window covers all three events and both users (HLL is
      // exact at tiny cardinalities).
      val full = rows.filter(_._1.contains("10:00:00"))
      assert(full.map(r => (r._2, r._3)).toSeq == Seq((3L, 2L)),
        s"10:00 window wrong: ${rows.toSeq}")
    } finally q.stop()
  }

  test("drift monitor scores in-distribution windows ~0 and flags a shifted window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Reference: uniform over buckets 0..4 (p = 0.2 each), silence in 5..9.
    val refHist = Seq.tabulate(5)(b => (b, 200000L))
      .toDF("bucket", "p_ref_e6")
    val input = MemoryStream[EventRow]
    val q = EventStream.driftMonitor(input.toDF(), refHist,
        expectedPerWindow = 10L)
      .writeStream.format("memory").queryName("drift")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // Window 10:00 matches the reference: 10 events, 2 per bucket 0..4.
      input.addData((0 until 10).map(i =>
        EventRow(i.toLong, ts(0, i + 1), i.toLong, "view", (i % 5) * 10 + 1.0)): _*)
      // Window 10:01 drifts hard: all 10 events in bucket 9.
      input.addData((0 until 10).map(i =>
        EventRow(100 + i.toLong, ts(1, i + 1), i.toLong, "view", 95.0)): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, bucket, n, psi_e6 FROM drift")
        .collect()
        .map(r => ((r.getTimestamp(0).toString.contains("10:00:00"), r.getInt(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      // In-distribution buckets: p_obs = 3/20 vs p_ref ~ 0.2 — small terms,
      // far below the drifted bucket's.
      val calm = (0 until 5).map(b => rows((true, b))._2)
      assert(calm.forall(_ >= 0), s"PSI terms must be >= 0: $calm")
      // Mutually-empty buckets (no reference mass, no events) score
      // exactly 0 — the symmetric-smoothing contract.
      val mutual = (5 until 10).map(b => rows((true, b)))
      assert(mutual.forall(r => r._1 == 0L && r._2 == 0L),
        s"empty-empty buckets must score 0: $mutual")
      // The shifted window concentrates in bucket 9 (p_ref ~ 1e-6).
      val (nHot, psiHot) = rows((false, 9))
      assert(nHot == 10L, s"all drifted events in bucket 9: $nHot")
      assert(calm.forall(_ < psiHot / 10),
        s"drifted bucket must dominate: calm=$calm hot=$psiHot")
      // Drift-by-DISAPPEARANCE: bucket 0 carries p_ref = 0.2 but received
      // ZERO events in the shifted window — the zero row must exist and
      // score well above the in-distribution terms.
      val (nGone, psiGone) = rows((false, 0))
      assert(nGone == 0L, s"bucket 0 should be empty in the drifted window: $nGone")
      assert(calm.forall(_ < psiGone),
        s"disappearance must score: calm=$calm gone=$psiGone")
    } finally q.stop()
  }

  test("drift monitor counts NULL-valued events in the explicit -1 bucket") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val refHist = Seq.tabulate(5)(b => (b, 200000L)).toDF("bucket", "p_ref_e6")
    // EventRow.value is a primitive Double, so NULLs need an Option-typed
    // stream — the shape a schema-rotted upstream feed would produce.
    val input = MemoryStream[(Long, Timestamp, Option[Double])]
    val q = EventStream.driftMonitor(
        input.toDF.toDF("event_id", "ts", "value"), refHist,
        expectedPerWindow = 10L)
      .writeStream.format("memory").queryName("drift_null")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      input.addData((0 until 10).map(i => (i.toLong, ts(0, i + 1),
        if (i < 4) None else Some(((i % 5) * 10 + 1.0): Double))): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT bucket, n, psi_e6 FROM drift_null")
        .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
      // The 4 NULL-valued events land in bucket -1 (not silently dropped),
      // the observed total is preserved, and — with no reference mass at
      // -1 — their presence scores as drift.
      assert(rows(-1)._1 == 4L, s"NULLs must be counted: $rows")
      assert(rows(-1)._2 > 0L, s"NULL arrivals must score drift: $rows")
      assert(rows.values.map(_._1).sum == 10L,
        s"observed total must include NULL events: $rows")
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val q = EventStream.streamingDedup(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        EventRow(1, ts(0, 10), 1, "click", 1.0),
        EventRow(2, ts(0, 20), 2, "view", 2.0),
        EventRow(1, ts(0, 10), 1, "click", 1.0)) // same-batch redelivery
      q.processAllAvailable()
      input.addData(
        EventRow(2, ts(0, 21), 2, "view", 2.0),  // cross-batch redelivery
        EventRow(3, ts(1, 0), 3, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_out").collect()
        .map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L),
        s"dedup emitted $ids — redeliveries must be dropped exactly once")
    } finally q.stop()
  }

  test("native session_window aggregation closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[EventRow]
    val q = input.toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "2 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), col("n"), col("v"))
      .writeStream.format("memory").queryName("sessions_native")
      .outputMode("append").start()
    try {
      // Two bursts for user 1, gap > 2 min between them -> two sessions.
      input.addData(EventRow(1, ts(0), 1, "a", 1.0), EventRow(2, ts(1), 1, "a", 2.0))
      q.processAllAvailable()
      input.addData(EventRow(3, ts(10), 1, "a", 4.0))
      q.processAllAvailable()
      input.addData(EventRow(4, ts(30), 9, "a", 0.0)) // advance watermark, close all
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n, v FROM sessions_native WHERE user_id = 1")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((2L, 3.0), (1L, 4.0)), rows.toString)
    } finally q.stop()
  }

  test("stream-stream inner join with watermarks (SymmetricHashJoin analog)") {
    // The reference wire carries SymmetricHashJoinExec (proto:1080-1090,
    // never exercised by its tests); Spark's stream-stream join is the
    // native equivalent: two unbounded sides, incremental hash join, state
    // bounded by watermark + time-range condition.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val clicks = MemoryStream[EventRow]
    val views = MemoryStream[EventRow]
    val joined = clicks.toDF().select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", "1 minute")
      .join(
        views.toDF().select(col("user_id").as("v_user"), col("ts").as("view_ts"),
            col("value").as("view_value"))
          .withWatermark("view_ts", "1 minute"),
        expr("""user_id = v_user AND
          view_ts BETWEEN click_ts AND click_ts + INTERVAL 2 MINUTES"""))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(EventRow(1, ts(0), 7, "click", 1.0))
      views.addData(
        EventRow(2, ts(1), 7, "view", 2.0),   // within 2 min -> joins
        EventRow(3, ts(5), 7, "view", 3.0),   // outside window -> no join
        EventRow(4, ts(1), 8, "view", 4.0))   // other user -> no join
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, click_value, view_value FROM ss_join").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet ==
        Set((7L, 1.0, 2.0)))
    } finally q.stop()
  }

  test("transformWithState keeps typed per-user state across micro-batches") {
    // Spark 4's stateful-processor API; requires the RocksDB state store.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.UserCount
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventRow]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
      val out = new java.util.concurrent.ConcurrentLinkedQueue[UserCount]()
      def runBatch(): Unit = {
        val q = EventStream.runningCounts(input.toDS())
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[UserCount], _: Long) =>
            ds.collect().foreach(out.add)
          }
          .start()
        assert(q.awaitTermination(60000), "micro-batch did not finish in 60 s")
        q.stop()
      }
      input.addData(EventRow(1, ts(0), 1, "click", 1.0),
        EventRow(2, ts(0, 30), 1, "view", 2.0),
        EventRow(3, ts(1), 2, "click", 3.0))
      runBatch()
      input.addData(EventRow(4, ts(2), 1, "purchase", 4.0))
      runBatch()
      import scala.jdk.CollectionConverters._
      val byUser = out.asScala.groupBy(_.user_id).view.mapValues(_.map(_.n_events).max)
      assert(byUser(1L) == 3L, s"user 1 state did not carry: $out")
      assert(byUser(2L) == 1L, s"user 2 miscounted: $out")
    } finally prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
  }

  test("event-time timers close inactive sessions without new input for the key") {
    // The timer face of transformWithState: user 1 goes quiet, user 2's
    // later events advance the watermark past user 1's last+gap, and the
    // STATE STORE emits the alert — no user-1 row in the closing batch.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.SessionAlert
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventRow]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_timer_ckpt").toString
      val out = new java.util.concurrent.ConcurrentLinkedQueue[SessionAlert]()
      def runBatch(): Unit = {
        val q = EventStream.inactivityAlerts(input.toDS(), gapMs = 120000L)
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[SessionAlert], _: Long) =>
            ds.collect().foreach(out.add)
          }
          .start()
        assert(q.awaitTermination(60000), "micro-batch did not finish in 60 s")
        q.stop()
      }
      input.addData(EventRow(1, ts(0), 1, "click", 1.0),
        EventRow(2, ts(0, 30), 1, "view", 2.0),
        EventRow(3, ts(1), 2, "click", 3.0))
      runBatch()
      assert(out.isEmpty, s"no timer should fire before the watermark moves: $out")
      // Only user 2 speaks; the watermark jumps to t0+10m, past user 1's
      // last(t0+30s) + 2m — the timer must close user 1.
      input.addData(EventRow(4, ts(10), 2, "view", 4.0))
      runBatch()
      import scala.jdk.CollectionConverters._
      val alerts = out.asScala.toSeq
      val u1 = alerts.filter(_.user_id == 1L)
      assert(u1.length == 1, s"exactly one alert for the quiet user: $alerts")
      assert(u1.head.n_events == 2L, s"alert must carry the session count: $u1")
      assert(u1.head.expired_at_ms == u1.head.last_ts_ms + 120000L,
        s"expiry must be last+gap: $u1")
      // A re-armed user whose timer has not expired stays open.
      assert(!alerts.exists(_.user_id == 2L), s"user 2 is still active: $alerts")
    } finally prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
  }

  test("streaming parquet file sink emits only watermark-finalized windows") {
    // Append-mode file sink: a window's row lands exactly once, only after
    // the watermark passes its end — the transactional (_spark_metadata)
    // file-sink path a corpus-stats stream would use in production.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val input = MemoryStream[EventRow]
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .start(s"$base/out")
    try {
      input.addData(
        EventRow(1, ts(0, 10), 1, "click", 1.0),
        EventRow(2, ts(0, 40), 2, "click", 2.0))
      q.processAllAvailable()
      // Window [10:00,10:01) is still open (watermark at 10:00:40 - 2 min).
      val open = spark.read.parquet(s"$base/out")
      assert(open.isEmpty, "an unfinalized window leaked to the file sink")
      input.addData(EventRow(3, ts(5), 3, "view", 3.0)) // watermark -> 10:03
      q.processAllAvailable()
      val closed = spark.read.parquet(s"$base/out")
        .select("event_type", "n").as[(String, Long)].collect().toMap
      assert(closed == Map("click" -> 2L),
        s"expected exactly the finalized click window, got $closed")
    } finally q.stop()
  }

  test("foreachBatch dedup ingest: exactly-once store across restart and replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val store = s"$base/store"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[(Long, String)]
    val src = input.toDF().toDF("doc_id", "text")
    def storeTexts() = spark.read.parquet(store).select("text")
      .as[String].collect().sorted.toSeq

    val q1 = EventStream.startDedupIngest(src, store, ckpt)
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")) // in-batch dup
      q1.processAllAvailable()
      input.addData((4L, "beta"), (5L, "gamma")) // cross-batch dup
      q1.processAllAvailable()
    } finally q1.stop()
    assert(storeTexts() == Seq("alpha", "beta", "gamma"),
      "in-batch and cross-batch duplicates must be dropped")

    // Restart from the same checkpoint: committed offsets are not re-read,
    // only post-restart data is ingested.
    val q2 = EventStream.startDedupIngest(src, store, ckpt)
    try {
      input.addData((6L, "gamma"), (7L, "delta"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(storeTexts() == Seq("alpha", "beta", "delta", "gamma"))

    // Crash-replay idempotence: re-running the last committed batch id
    // against the same store must rebuild its partition identically.
    val last = spark.read.parquet(store)
      .select(col("ingest_batch").cast("long")).as[Long].collect().max
    val replay = Seq((6L, "gamma"), (7L, "delta")).toDF("doc_id", "text")
    EventStream.ingestBatch(replay, last, store)
    assert(storeTexts() == Seq("alpha", "beta", "delta", "gamma"),
      s"replaying committed batch $last must be a no-op on the store")
    // The in-batch winner is deterministic: the LOWEST doc_id per digest
    // (doc 3 was the in-batch "alpha" duplicate, doc 1 must have won).
    val ids = spark.read.parquet(store).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L, 7L), s"non-deterministic winners: $ids")

    // The store is a digest-bucketed catalog table, and the per-batch
    // anti-join is exchange-free on the store side (broadcast off = the
    // 100 TB regime): only the micro-batch shuffles.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val table = EventStream.storeTableName(store)
      assert(spark.catalog.tableExists(table))
      val nextBatch = Seq((8L, "epsilon")).toDF("doc_id", "text")
        .withColumn("digest", sha2(col("text"), 256))
      val novel = nextBatch.join(
        spark.table(table).filter(col("ingest_batch") < 99).select("digest"),
        Seq("digest"), "left_anti")
      val flat = flatten(novel.queryExecution.executedPlan)
      def isStoreScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("graft_ingest"))
        case _ => false
      }
      val storeScans = flat.filter(isStoreScan).map(_.asInstanceOf[FileSourceScanExec])
      assert(storeScans.nonEmpty && storeScans.forall(_.bucketedScan),
        "store must scan its buckets in place")
      // The anti-join's store-side child subtree holds no exchange.
      val storeSides = flat.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          j.children.filter(c => flatten(c).exists(isStoreScan))
      }.flatten
      assert(storeSides.nonEmpty, "no join over the store found")
      assert(!storeSides.exists(s => flatten(s).exists {
        case _: ShuffleExchangeExec => true
        case _ => false
      }), "the store side of the ingest anti-join must not shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("file-source landing directory feeds the dedup ingest end-to-end") {
    // The deploy shape: docs land as parquet files in a directory, the
    // file source discovers them per micro-batch, and the foreachBatch
    // ingest dedups them into the store — no MemoryStream anywhere.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_landing").toString
    val landing = s"$base/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    def land(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(landing)
    val src = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = EventStream.startDedupIngest(src, s"$base/store", s"$base/ckpt")
    try {
      land((1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
      land((3L, "beta"), (4L, "gamma")) // cross-file duplicate
      q.processAllAvailable()
      val store = spark.read.parquet(s"$base/store")
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(store == Seq((1L, "alpha"), (2L, "beta"), (4L, "gamma")),
        s"landing-dir ingest produced $store")
    } finally q.stop()
  }

  test("sessionization accumulates per-user state across micro-batches") {
    // ProcessingTimeTimeout makes a default-trigger query re-fire batches
    // continuously to evaluate timeouts, so drive it with AvailableNow runs
    // sharing a checkpoint: each run is one micro-batch, state carries over.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.SessionSummary
    val input = MemoryStream[EventRow]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_session_ckpt").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[SessionSummary]()
    def runBatch(): Unit = {
      val q = EventStream.sessionize(input.toDS())
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[SessionSummary], _: Long) =>
          ds.collect().foreach(out.add)
        }
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    input.addData(EventRow(1, ts(0), 1, "click", 1.0),
      EventRow(2, ts(0, 30), 1, "click", 2.0))
    runBatch()
    input.addData(EventRow(3, ts(1), 1, "view", 4.0))
    runBatch()
    import scala.jdk.CollectionConverters._
    val forUser1 = out.asScala.filter(_.user_id == 1L)
    assert(forUser1.map(_.n_events).max == 3L,
      s"state did not carry across micro-batches: $forUser1")
    assert(forUser1.find(_.n_events == 3L).get.total_value == 7.0)
  }
}
