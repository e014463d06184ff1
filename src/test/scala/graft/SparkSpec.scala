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
  lazy val session: SparkSession = {
    val s = Sessions.local("8")
    gateway.Udfs.register(s)
    s
  }
}
