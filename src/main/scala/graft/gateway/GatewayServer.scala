package graft.gateway

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import scala.util.control.NonFatal

/** A minimal socket front-end for [[JobRuntime]] — the client-facing
  * service surface of SURVEY §3.1 (the reference exposes FlightSQL over
  * gRPC, `integration-tests/app/src/main.rs:101-330`; this is the same
  * submit → tickets → per-ticket streaming fetch contract over a
  * line-delimited JSON protocol, dependency-free).
  *
  * Protocol (one JSON object per line):
  *   {"op": "submit", "sql": "...", "meta": {...}}
  *       -> {"ok": true, "job_id": "...", "partitions": N,
  *           "columns": [...]}
  *   {"op": "fetch", "job_id": "...", "partition": P}
  *       -> one {"row": [...]} line per row, then {"ok": true, "rows": N}
  *       (text mode — the human/debug wire)
  *   {"op": "fetch_arrow", "job_id": "...", "partition": P}
  *       -> {"ok": true, "format": "arrow_ipc_stream"}\n, then one raw
  *       LZ4-compressed Arrow IPC stream (schema + one record batch per
  *       fetch page + EOS, self-delimiting), then {"ok": true, "rows": N}
  *       — the reference's result wire (LZ4 Arrow FlightData,
  *       `networks/tonic/src/server.rs:109-141`)
  *   {"op": "running_jobs"} / {"op": "cluster_nodes"}
  *       -> one {"row": [...]} per row, then {"ok": true, "rows": N}
  *   {"op": "cancel", "job_id": "..."} -> {"ok": true}
  *   errors -> {"ok": false, "error": "..."}
  *
  * The accept loop and per-connection handlers run on daemon threads
  * (driver-side control plane only — row data streams straight from the
  * per-partition runJob results, never accumulating beyond one partition).
  */
final class GatewayServer(runtime: JobRuntime, port: Int = 0,
    arrowBatchRows: Int = 4096) extends AutoCloseable {
  private val server = new ServerSocket(port)
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-gateway-conn"); t.setDaemon(true); t
  })
  @volatile private var closed = false

  /** The bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable { def run(): Unit = handle(sock) })
      } catch {
        case _: SocketException if closed => () // normal shutdown
        case NonFatal(_) => ()
      }
    }
  }, "graft-gateway-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  // --- tiny JSON helpers (no deps; values are strings/numbers/objects) ---
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jval(v: Any): String = v match {
    case null => "null"
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case t: java.sql.Timestamp => jstr(t.toString)
    case d: java.sql.Date => jstr(d.toString)
    case seq: scala.collection.Seq[_] => seq.map(jval).mkString("[", ",", "]")
    case other => jstr(String.valueOf(other))
  }

  /** Extract a top-level string field from one-line JSON (protocol fields
    * are flat strings/ints — a full parser is not warranted here). */
  private def field(json: String, name: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|(\\d+))").r
    m.findFirstMatchIn(json).map { g =>
      Option(g.group(2)).map(_.replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(g.group(3))
    }
  }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val raw = sock.getOutputStream
    val out = new PrintWriter(raw, true)
    try {
      var line = in.readLine()
      while (line != null && !closed) {
        try dispatch(line.trim, out, raw)
        catch {
          case NonFatal(e) =>
            out.println(s"""{"ok": false, "error": ${jstr(
              Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
        }
        line = in.readLine()
      }
    } catch { case NonFatal(_) => () }
    finally sock.close()
  }

  private val handles = new scala.collection.concurrent.TrieMap[String, JobHandle]()

  private def streamRows(rows: Iterator[org.apache.spark.sql.Row], out: PrintWriter): Long = {
    var n = 0L
    rows.foreach { r =>
      out.println(s"""{"row": ${jval(r.toSeq)}}""")
      n += 1
    }
    n
  }

  private def dispatch(line: String, out: PrintWriter, raw: java.io.OutputStream): Unit =
    field(line, "op") match {
      case Some("submit") =>
        val sql = field(line, "sql").getOrElse(
          throw new IllegalArgumentException("submit requires sql"))
        val h = runtime.submit(sql)
        handles.put(h.jobId, h)
        val cols = h.schema.fieldNames.toSeq
        out.println(s"""{"ok": true, "job_id": ${jstr(h.jobId)}, """ +
          s""""partitions": ${h.tickets.size}, "columns": ${jval(cols)}}""")
      case Some("fetch") =>
        val jobId = field(line, "job_id").getOrElse(
          throw new IllegalArgumentException("fetch requires job_id"))
        val p = field(line, "partition").getOrElse("0").toInt
        val h = handles.getOrElse(jobId,
          throw new IllegalStateException(s"unknown job $jobId"))
        // Bounded streaming: rows go straight from ≤fetchPageSize-row pages
        // to the socket. A slow client backpressures the page producer via
        // blocking TCP writes — the reference's bounded-channel semantics
        // (dist/src/runtime.rs:253-303) end to end.
        val n = {
          val stream = h.fetchStream(Ticket(jobId, p))
          try streamRows(stream, out)
          catch { case e: Throwable => handles.remove(jobId); throw e }
          finally stream.close()
        }
        // Evict once the job reaches a terminal state (all partitions
        // delivered → runtime cleaned up); otherwise the handle map — and
        // the DataFrame/RDD it pins — grows without bound in a long-lived
        // gateway.
        h.status match {
          case JobStatus.Completed | JobStatus.Cancelled | JobStatus.Failed(_) =>
            handles.remove(jobId)
          case _ => ()
        }
        out.println(s"""{"ok": true, "rows": $n}""")
      case Some("fetch_arrow") =>
        val jobId = field(line, "job_id").getOrElse(
          throw new IllegalArgumentException("fetch_arrow requires job_id"))
        val p = field(line, "partition").getOrElse("0").toInt
        val h = handles.getOrElse(jobId,
          throw new IllegalStateException(s"unknown job $jobId"))
        // Binary result wire: ack line, then a self-delimiting LZ4 Arrow
        // IPC stream fed page-by-page from the bounded fetch — at no point
        // does the server hold more than one page + one encoded batch.
        val stream = h.fetchStream(Ticket(jobId, p))
        val n =
          try {
            out.println("""{"ok": true, "format": "arrow_ipc_stream"}""")
            out.flush()
            val written = ArrowCodec.write(h.schema, stream, raw, arrowBatchRows)
            raw.flush()
            written
          } catch { case e: Throwable => handles.remove(jobId); throw e }
          finally stream.close()
        h.status match {
          case JobStatus.Completed | JobStatus.Cancelled | JobStatus.Failed(_) =>
            handles.remove(jobId)
          case _ => ()
        }
        out.println(s"""{"ok": true, "rows": $n}""")
      case Some("running_jobs") =>
        val n = streamRows(runtime.runningJobs().collect().iterator, out)
        out.println(s"""{"ok": true, "rows": $n}""")
      case Some("cluster_nodes") =>
        val n = streamRows(runtime.clusterNodes().collect().iterator, out)
        out.println(s"""{"ok": true, "rows": $n}""")
      case Some("cancel") =>
        field(line, "job_id").foreach { id =>
          runtime.cancel(id)
          handles.remove(id)
        }
        out.println("""{"ok": true}""")
      case other =>
        throw new IllegalArgumentException(s"unknown op: $other")
    }

  override def close(): Unit = {
    closed = true
    try server.close() catch { case NonFatal(_) => () }
    pool.shutdownNow()
  }
}
