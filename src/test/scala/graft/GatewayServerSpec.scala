package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import graft.gateway.{ArrowCodec, GatewayServer, JobRuntime}
import org.apache.spark.sql.types._

/** Drives the socket gateway like an external client: submit over TCP,
  * fetch each ticket as a row stream, observe running_jobs/cluster_nodes,
  * and exercise the error path. */
class GatewayServerSpec extends SparkSpec {

  private def withServer[A](f: (Socket, BufferedReader, PrintWriter) => A): A = {
    val rt = new JobRuntime(spark)
    val srv = new GatewayServer(rt)
    val sock = new Socket("127.0.0.1", srv.boundPort)
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(sock.getOutputStream, true)
    try f(sock, in, out)
    finally { sock.close(); srv.close(); rt.close() }
  }

  test("submit -> per-ticket row streaming over a real socket") {
    withServer { (_, in, out) =>
      out.println("""{"op": "submit", "sql": "SELECT id, id * id AS sq FROM range(0, 100, 1, 4)"}""")
      val resp = in.readLine()
      assert(resp.contains("\"ok\": true") && resp.contains("\"partitions\": 4"), resp)
      assert(resp.contains("\"columns\": [\"id\",\"sq\"]"), resp)
      val jobId = """"job_id": "([^"]+)"""".r.findFirstMatchIn(resp).get.group(1)
      var rows = 0
      for (p <- 0 until 4) {
        out.println(s"""{"op": "fetch", "job_id": "$jobId", "partition": $p}""")
        var line = in.readLine()
        while (line.startsWith("{\"row\"")) { rows += 1; line = in.readLine() }
        assert(line.contains("\"ok\": true"), line)
      }
      assert(rows == 100)
    }
  }

  test("running_jobs and cluster_nodes stream over the socket") {
    withServer { (_, in, out) =>
      out.println("""{"op": "submit", "sql": "SELECT 1 AS one"}""")
      in.readLine()
      out.println("""{"op": "running_jobs"}""")
      var line = in.readLine()
      var jobRows = 0
      while (line.startsWith("{\"row\"")) { jobRows += 1; line = in.readLine() }
      assert(jobRows == 1, s"expected 1 live job, got $jobRows")
      out.println("""{"op": "cluster_nodes"}""")
      line = in.readLine()
      var nodeRows = 0
      while (line.startsWith("{\"row\"")) { nodeRows += 1; line = in.readLine() }
      assert(nodeRows >= 1)
    }
  }

  test("fetch_arrow round-trips a schema-checked LZ4 Arrow IPC stream over TCP") {
    // The reference's result wire: LZ4-compressed Arrow record batches
    // (networks/tonic/src/server.rs:109-141). Client reads the ack line
    // byte-wise off the raw stream (no read-ahead), then hands the same
    // stream to the Arrow reader, then reads the trailing control line.
    val rt = new JobRuntime(spark)
    val srv = new GatewayServer(rt, arrowBatchRows = 256)
    val sock = new Socket("127.0.0.1", srv.boundPort)
    try {
      val rawIn = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new PrintWriter(sock.getOutputStream, true)
      def readLineRaw(): String = {
        val sb = new StringBuilder
        var b = rawIn.read()
        while (b != -1 && b != '\n') { sb.append(b.toChar); b = rawIn.read() }
        sb.toString
      }
      out.println("""{"op": "submit", "sql": "SELECT id, CAST(id AS STRING) AS s, CAST(id AS DOUBLE) / 4 AS d, id % 3 = 0 AS flag, IF(id % 2 = 0, NULL, id * 10) AS n FROM range(0, 1000, 1, 1)"}""")
      val resp = readLineRaw()
      assert(resp.contains("\"ok\": true"), resp)
      val jobId = """"job_id": "([^"]+)"""".r.findFirstMatchIn(resp).get.group(1)
      out.println(s"""{"op": "fetch_arrow", "job_id": "$jobId", "partition": 0}""")
      val ack = readLineRaw()
      assert(ack.contains("\"format\": \"arrow_ipc_stream\""), ack)
      val (schema, rows) = ArrowCodec.read(rawIn)
      assert(schema == StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("s", StringType, nullable = false),
        StructField("d", DoubleType, nullable = true),
        StructField("flag", BooleanType, nullable = true),
        StructField("n", LongType, nullable = true))), schema.treeString)
      assert(rows.size == 1000)
      assert(rows(7) == org.apache.spark.sql.Row(7L, "7", 1.75, false, 70L))
      assert(rows(8).isNullAt(4))
      val fin = readLineRaw()
      assert(fin.contains("\"rows\": 1000"), fin)
      // The same connection still speaks the text protocol afterwards.
      out.println("""{"op": "cluster_nodes"}""")
      var line = readLineRaw()
      var nodeRows = 0
      while (line.startsWith("{\"row\"")) { nodeRows += 1; line = readLineRaw() }
      assert(nodeRows >= 1)
    } finally { sock.close(); srv.close(); rt.close() }
  }

  test("concurrent fetch_arrow clients decode disjoint partitions correctly") {
    // Four independent TCP clients each stream a different partition of
    // the same job as Arrow IPC at the same time — the reference's
    // many-FlightData-streams-per-job serving shape.
    val rt = new JobRuntime(spark)
    val srv = new GatewayServer(rt, arrowBatchRows = 64)
    def readLineRaw(in: java.io.InputStream): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b != -1 && b != '\n') { sb.append(b.toChar); b = in.read() }
      sb.toString
    }
    val ctl = new Socket("127.0.0.1", srv.boundPort)
    try {
      val ctlIn = new java.io.BufferedInputStream(ctl.getInputStream)
      val ctlOut = new PrintWriter(ctl.getOutputStream, true)
      ctlOut.println("""{"op": "submit", "sql": "SELECT id FROM range(0, 1000, 1, 4)"}""")
      val resp = readLineRaw(ctlIn)
      assert(resp.contains("\"ok\": true"), resp)
      val jobId = """"job_id": "([^"]+)"""".r.findFirstMatchIn(resp).get.group(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futs = (0 until 4).map { p =>
          pool.submit(new java.util.concurrent.Callable[(Int, Long)] {
            def call(): (Int, Long) = {
              val sock = new Socket("127.0.0.1", srv.boundPort)
              try {
                val rawIn = new java.io.BufferedInputStream(sock.getInputStream)
                val out = new PrintWriter(sock.getOutputStream, true)
                out.println(s"""{"op": "fetch_arrow", "job_id": "$jobId", "partition": $p}""")
                val ack = readLineRaw(rawIn)
                assert(ack.contains("\"format\": \"arrow_ipc_stream\""), ack)
                val (_, rows) = ArrowCodec.read(rawIn)
                (rows.size, rows.map(_.getLong(0)).sum)
              } finally sock.close()
            }
          })
        }
        val res = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        assert(res.map(_._1).sum == 1000, s"row counts: ${res.map(_._1)}")
        assert(res.map(_._2).sum == (0L until 1000L).sum,
          "row values were crossed between concurrent Arrow streams")
      } finally { pool.shutdownNow(); () }
    } finally { ctl.close(); srv.close(); rt.close() }
  }

  test("protocol errors answer with ok=false and the connection survives") {
    withServer { (_, in, out) =>
      out.println("""{"op": "definitely_not_an_op"}""")
      val err = in.readLine()
      assert(err.contains("\"ok\": false") && err.contains("unknown op"), err)
      out.println("""{"op": "fetch", "job_id": "nope", "partition": 0}""")
      val err2 = in.readLine()
      assert(err2.contains("\"ok\": false"), err2)
      // Still usable afterwards.
      out.println("""{"op": "submit", "sql": "SELECT 1 AS one"}""")
      assert(in.readLine().contains("\"ok\": true"))
    }
  }
}
