package graft

/** Dev tool: print condensed executed plans (exchanges, joins, windows,
  * aggregates) for the named queries — the fast way to audit that a query
  * plans the shape you'd want at scale. Usage:
  *
  *   sbt "runMain graft.PlanAudit <sfDir> q_a q_b ..."   (no names = all)
  */
object PlanAudit {
  private val Interesting =
    Seq("Exchange", "Join", "Window", "Sort", "TakeOrdered", "HashAggregate",
      "CartesianProduct", "Generate", "Scan parquet")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("8")
    gateway.Udfs.register(spark)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"=== $q")
      try {
        val plan = SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        plan.split("\n")
          .filter(l => Interesting.exists(l.contains))
          .foreach(l => println("  " + l.trim.take(160)))
      } catch { case e: Throwable => println(s"  ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
