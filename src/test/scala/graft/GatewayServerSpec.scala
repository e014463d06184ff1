package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import graft.gateway.{GatewayServer, JobRuntime}

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
