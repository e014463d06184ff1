package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import graft.gateway.JobRuntime

/** Stress layer (SURVEY §5 layer 4, reference `sqllogictest.rs:28-77`):
  * 50 concurrent gateway queries, 3 patterns cycled, all succeed well
  * inside the reference's 180 s envelope, and the registry is clean after.
  */
class StressSpec extends SparkSpec {

  test("50 concurrent queries complete and clean up in < 180 s") {
    val rt = new JobRuntime(spark)
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val patterns = Seq(
        () => rt.submit(s"SELECT count(*) AS n FROM range(0, 100000)"),
        () => rt.submitDataFrame {
          import org.apache.spark.sql.functions._
          val s1 = Tables.t(spark, sfDir, "supplier").as("s1")
          val s2 = Tables.t(spark, sfDir, "supplier").as("s2")
          s1.join(s2, col("s1.s_acctbal") > col("s2.s_acctbal"))
            .groupBy(col("s1.s_suppkey")).count()
        },
        () => rt.submitDataFrame {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions._
          val w = Window.partitionBy(col("l_suppkey"))
            .orderBy(col("l_extendedprice").desc_nulls_last)
          Tables.t(spark, sfDir, "lineitem")
            .withColumn("rk", rank().over(w)).filter(col("rk") === 1)
        })
      val t0 = System.nanoTime()
      val futures = (0 until 50).map { i =>
        Future { patterns(i % 3)().fetchAll().size }
      }
      val sizes = Await.result(Future.sequence(futures), 180.seconds)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sizes.forall(_ > 0))
      info(f"50 concurrent queries in $sec%.1f s (reference gate: 180 s)")
      assert(sec < 180.0)
      assert(rt.liveJobIds.isEmpty, "jobs not cleaned after completion")
    } finally { rt.close(); pool.shutdownNow() }
  }
}
