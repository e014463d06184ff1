package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, StreamingQuery, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double,
    closed: Boolean)

final case class UserCount(user_id: Long, n_events: Long)

/** transformWithState processor: a running event count per user in one
  * typed ValueState handle. */
class CountProcessor extends StatefulProcessor[Long, EventRow, UserCount] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventRow],
      timers: TimerValues): Iterator[UserCount] = {
    val next = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(next)
    Iterator.single(UserCount(key, next))
  }
}

final case class SessionAlert(user_id: Long, n_events: Long, last_ts_ms: Long,
    expired_at_ms: Long)

/** Event-time-TIMER sessionization: a per-user inactivity alert emitted by
  * the state store itself when the WATERMARK passes last-event + gap — the
  * transformWithState face [[CountProcessor]] doesn't exercise (timers),
  * and the shape that replaces "scan everything and look for quiet users"
  * with state-store-driven expiry: no input row for an idle user is ever
  * needed to close them out. The timer is re-armed on every batch
  * (delete-then-register keeps exactly one per key); expiry emits the
  * session summary and clears the key's state, so state size stays
  * |active users| at any ingest scale. */
class InactivityAlertProcessor(gapMs: Long)
    extends StatefulProcessor[Long, EventRow, SessionAlert] {
  @transient private var count: ValueState[Long] = _
  @transient private var lastTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    lastTs = getHandle.getValueState[Long]("last_ts",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[EventRow],
      timers: TimerValues): Iterator[SessionAlert] = {
    var n = if (count.exists()) count.get() else 0L
    var last = if (lastTs.exists()) lastTs.get() else Long.MinValue
    rows.foreach { r => n += 1; last = math.max(last, r.ts.getTime) }
    if (lastTs.exists()) getHandle.deleteTimer(lastTs.get() + gapMs)
    count.update(n)
    lastTs.update(last)
    getHandle.registerTimer(last + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SessionAlert] = {
    val out = SessionAlert(key, count.get(), lastTs.get(),
      expired.getExpiryTimeInMs)
    count.clear(); lastTs.clear()
    Iterator.single(out)
  }
}

/** Structured Streaming transforms over the `events` shape.
  *
  * The reference's "streaming" is pull-based *execution* streaming, which
  * Spark's shuffle/iterator model already covers (SURVEY §1) — so this
  * module is the beyond-parity piece: event-time processing for an
  * append-only ingest pipeline (the shape a training-data corpus grows by).
  * Both transforms are expressed on unbounded DataFrames and run identically
  * on a bounded batch frame, which is how the specs validate them.
  *
  * Scale notes: windowed aggregation state is keyed by (window, user) —
  * uniformly distributed; watermarking bounds state size so a 100 TB/day
  * ingest holds only `watermark x rate` state per executor.
  */
object EventStream {

  /** Tumbling 1-minute window per event_type with a 2-minute watermark:
    * late events beyond the watermark are dropped, state is bounded. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Hopping (sliding) 5-minute windows every 1 minute — the STREAMING
    * form of the batch q_hopping_window pair: each event updates the
    * k = size/slide = 5 open windows covering it, active users ride an
    * HLL sketch (`approx_count_distinct`) so per-window state is
    * FIXED-SIZE — exact streaming distinct would hold every user id for
    * every open window — and the watermark expires window state as event
    * time advances. Same state-scale argument as the batch HLL variant,
    * applied to the store instead of the shuffle. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
      .select(col("window.start").as("win_start"), col("n"),
        col("n_users_approx"))

  /** Custom sessionization with mapGroupsWithState: a user's session closes
    * after 5 minutes of processing-time inactivity (KeyValueGroupedDataset
    * stateful API — the Spark-native replacement for hand-rolled stateful
    * operators). */
  def sessionize(events: Dataset[EventRow]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), SessionSummary](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, rows, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (n, v) = state.get
            state.remove()
            SessionSummary(userId, n, v, closed = true)
          } else {
            val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
            var n = n0; var v = v0
            rows.foreach { r => n += 1; v += r.value }
            state.update((n, v))
            state.setTimeoutDuration("5 minutes")
            SessionSummary(userId, n, v, closed = false)
          }
      }
  }

  /** Streaming exact dedup at ingest — the streaming face of
    * pipeline/Dedup's exact strategy: re-delivered events (at-least-once
    * sources redeliver on retry) are dropped by key, with state bounded by
    * the watermark instead of growing with the corpus. At 100 TB/day the
    * state held is only `watermark x ingest rate` keys per executor, hash
    * partitioned by the dedup key. */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Streaming distribution-drift monitor — the streaming face of the
    * batch `q_snapshot_drift` PSI gate: per 1-minute window, histogram
    * the event `value` into decade buckets and score each bucket's
    * population-stability term against a STATIC reference histogram.
    *
    * `refHist` carries (bucket, p_ref_e6) — reference probabilities in
    * e6 units, metadata-sized, broadcast; `expectedPerWindow` is the
    * configured nominal event rate (monitoring needs an expectation to
    * normalize against — a second streaming aggregation for the window
    * total would be a chained stateful agg, which Structured Streaming
    * forbids in one query). p_obs Laplace-smooths by the bucket count so
    * silent buckets stay finite, and each term is floored at 1e6 once
    * (the ln-parity convention); terms stay PER (window, bucket) — a
    * cross-bucket sum is the consumer's exact integer add.
    *
    * Scale: ONE stateful aggregation keyed by window — watermark-expired,
    * one 10-counter row of state per open window, independent of ingest
    * rate — then a broadcast join and map-side arithmetic. */
  def driftMonitor(events: DataFrame, refHist: DataFrame,
      expectedPerWindow: Long): DataFrame = {
    val nBuckets = 10
    // One counter PER BUCKET inside a window-keyed aggregation (not a
    // (window, bucket)-keyed one): every window emits all nBuckets rows,
    // zeros included — drift-by-DISAPPEARANCE from a reference-heavy
    // bucket scores its full PSI term instead of silently emitting no
    // row. State = one 10-counter row per open window. Out-of-domain
    // values clamp into the edge buckets on both ends.
    val bucketOf = greatest(lit(0),
      least(floor(col("value") / 10).cast("int"), lit(nBuckets - 1)))
    // NULL-valued events get their own bucket -1. Subtle: Spark's
    // least/greatest SKIP null arguments (they return null only when ALL
    // args are null), so bucketOf silently clamps a NULL value into the
    // top bucket — a schema-rotted upstream feed would masquerade as
    // legitimate high-value drift. The explicit isNotNull guard keeps the
    // numeric buckets honest, and refHist has no -1 row, so its reference
    // probability coalesces to 0 and any NULL arrivals score their full
    // smoothed PSI term: schema rot shows up AS drift, distinguishably.
    val counters =
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("nNull") +:
      Seq.tabulate(nBuckets)(b =>
        sum(when(col("value").isNotNull && bucketOf === b, 1L)
          .otherwise(0L)).as(s"n$b"))
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(counters.head, counters.tail: _*)
      .select(col("window.start").as("win_start"), posexplode(
        array(col("nNull") +: Seq.tabulate(nBuckets)(b => col(s"n$b")): _*)))
      .toDF("win_start", "pos", "n")
      .select(col("win_start"), (col("pos") - 1).as("bucket"), col("n"))
      .join(broadcast(refHist), Seq("bucket"), "left_outer")
      .select(col("win_start"), col("bucket"), col("n"),
        floor(lit(1e6) * {
          // SYMMETRIC smoothing: the reference converts to an expected
          // COUNT and smooths exactly like the observation — a bucket
          // empty on both sides then scores exactly 0 (asymmetric
          // smoothing would manufacture phantom drift there). The
          // Laplace denominator counts one pseudo-count per EMITTED
          // bucket — nBuckets numeric plus the -1 NULL bucket — so the
          // smoothed per-window probabilities sum to ~1 over exactly the
          // rows this query emits (ADVICE r9: the 10-bucket denominator
          // left the -1 row on a different convention).
          val denom = lit((expectedPerWindow + nBuckets + 1).toDouble)
          val pObs = (col("n") + 1).cast("double") / denom
          val nRef = coalesce(col("p_ref_e6"), lit(0L)).cast("double") /
            1e6 * expectedPerWindow
          val pRef = (nRef + 1) / denom
          (pObs - pRef) * log(pObs / pRef)
        }).as("psi_e6"))
  }

  /** Wire a memory-source stream of events through windowedCounts into an
    * in-memory sink; returns the query name to poll. Used by specs and as
    * the reference wiring for a real (kafka/file) source at deploy time. */
  /** Running per-user event counts with Spark 4's transformWithState —
    * the arbitrary-stateful-processing API that supersedes
    * mapGroupsWithState (typed state handles, timers, TTL; RocksDB state
    * store required). The processor holds one ValueState[Long] per user:
    * state size is |active users|, hash-partitioned by key, exactly the
    * bounded-state shape a 100 TB/day ingest needs. */
  def runningCounts(events: Dataset[EventRow]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** [[InactivityAlertProcessor]] wired in event-time mode: the input must
    * carry a watermark (it drives timer expiry). */
  def inactivityAlerts(events: Dataset[EventRow], gapMs: Long)
      : Dataset[SessionAlert] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new InactivityAlertProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Exactly-once dedup ingest into a parquet corpus store via foreachBatch —
    * the streaming face of [[graft.pipeline.Dedup]]'s exact strategy and of
    * `q_dedup_incremental`: each micro-batch of `(doc_id, text)` is
    * sha-256-deduped within itself and anti-joined against every digest
    * already in the store, and only the novel documents land, under the
    * batch's own `ingest_batch=<id>` partition.
    *
    * Exactly-once is structural, not transactional: checkpoint recovery
    * redelivers a batch under the SAME batch id, [[ingestBatch]] rebuilds
    * that one partition from scratch against the (immutable) earlier
    * partitions, and the merge is deterministic — the standard idempotent
    * foreachBatch sink pattern. The store is a digest-BUCKETED (+ sorted)
    * external table, so the per-batch anti-join is exchange-free on the
    * store side: only the micro-batch (tiny) shuffles, the historical
    * corpus (huge) is read in place bucket-by-bucket — the shape that
    * keeps per-batch cost independent of store size at 100 TB. A JVM
    * restart loses the in-memory catalog but not the files;
    * [[ensureStoreTable]] re-registers the table and recovers its
    * partitions before the first post-restart batch. */
  def startDedupIngest(source: DataFrame, storeDir: String,
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch, batchId, storeDir))
      .start()

  private[graft] val STORE_BUCKETS = 16

  /** Catalog name for a store directory — stable across restarts (derived
    * from the path, not the session). */
  private[graft] def storeTableName(storeDir: String): String =
    "graft_ingest_" + java.security.MessageDigest.getInstance("MD5")
      .digest(storeDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** Register the store's bucketed external table if this JVM hasn't yet:
    * after a restart the files exist but the in-memory catalog is empty,
    * so recreate the entry (schema + digest bucketing) over the existing
    * location and recover the already-ingested partitions. */
  private def ensureStoreTable(spark: SparkSession, table: String,
      storeDir: String, dataSchema: org.apache.spark.sql.types.StructType): Unit = {
    if (spark.catalog.tableExists(table)) return
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return // nothing ingested yet: first append creates it
    spark.sql(
      s"""CREATE TABLE $table (${dataSchema.toDDL}, ingest_batch BIGINT)
         |USING parquet
         |PARTITIONED BY (ingest_batch)
         |CLUSTERED BY (digest) SORTED BY (digest) INTO $STORE_BUCKETS BUCKETS
         |LOCATION '$storeDir'""".stripMargin)
    spark.catalog.recoverPartitions(table)
  }

  private[graft] def ingestBatch(batch: Dataset[Row], batchId: Long,
      storeDir: String): Unit = {
    val spark = batch.sparkSession
    // Replay idempotence: this batch id owns exactly one partition
    // directory; a post-crash redelivery deletes the partial partition and
    // rebuilds it against the same prior store.
    val own = new org.apache.hadoop.fs.Path(s"$storeDir/ingest_batch=$batchId")
    val fs = own.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(own)) { fs.delete(own, true); () }
    // In-batch winner must be DETERMINISTIC (lowest doc_id), not
    // dropDuplicates' partitioning-dependent arbitrary row: a replayed
    // batch recomputes under a different task layout and must still land
    // byte-identical contents.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("digest")).orderBy(col("doc_id"))
    val hashed = batch.withColumn("digest", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val table = storeTableName(storeDir)
    ensureStoreTable(spark, table, storeDir, hashed.schema)
    // Store side comes through the catalog so its digest bucketing reaches
    // the planner: the anti-join shuffles ONLY the micro-batch.
    val prior =
      if (spark.catalog.tableExists(table))
        Some(spark.table(table)
          .filter(col("ingest_batch") < batchId).select("digest"))
      else None
    val novel = prior.fold(hashed)(p => hashed.join(p, Seq("digest"), "left_anti"))
    // One file per bucket per batch (the repartition matches the table's
    // bucket hash), instead of tasks x buckets fragments.
    novel.withColumn("ingest_batch", lit(batchId))
      .repartition(STORE_BUCKETS, col("digest"))
      .write.mode("append")
      .partitionBy("ingest_batch")
      .bucketBy(STORE_BUCKETS, "digest").sortBy("digest")
      .option("path", storeDir)
      .saveAsTable(table)
  }

  def startWindowedQuery(spark: SparkSession, source: DataFrame, name: String) =
    windowedCounts(source)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update())
      .start()
}
