package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. sf0.001 keeps the full-corpus run
  * fast; correctness at sf0.01 is the driver's DuckDB gate, these specs are
  * the fast in-repo layer (SURVEY §5). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  // Revivable, not a lazy val: LocalClusterSpec stops the shared local
  // session to run its own local-cluster[2,...] one (one SparkContext per
  // JVM), so any suite ordered after it must get a FRESH local session
  // instead of the stopped one.
  private var s: SparkSession = _
  def session: SparkSession = synchronized {
    if (s == null || s.sparkContext.isStopped) {
      s = Sessions.local("8")
      gateway.Udfs.register(s)
    }
    s
  }
}
