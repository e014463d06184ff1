package graft.gateway

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Fault-injection UDFs matching the reference's test surface
  * (`integration-tests/src/data.rs:94-158`): `panic()` proves a failing
  * task kills the query but not the service (executor JVM survives a task
  * exception natively in Spark), and `cpu_intensive(n)` pins a core with an
  * iterative fibonacci so concurrency isolation can be measured
  * (`tests/exception.rs:56-118`).
  */
object Udfs {

  /** Iterative fibonacci, wrapping like the reference's `wrapping_add`. */
  def fib(n: Long): Long = {
    var a = 0L; var b = 1L
    var i = 0L; val m = math.abs(n)
    while (i < m) { val t = a + b; a = b; b = t; i += 1 }
    a
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("panic",
      udf(() => { throw new RuntimeException("udf panicked"); 0 }).asNondeterministic())
    spark.udf.register("cpu_intensive", udf((n: Long) => fib(n)).asNondeterministic())
  }
}
