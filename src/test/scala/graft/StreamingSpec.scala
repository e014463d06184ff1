package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
