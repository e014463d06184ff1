package graft

import org.apache.spark.sql.SparkSession

/** One place for the session knobs every entry point (Verify, Bench, tests,
  * gateway) must agree on. Mirrors the reference app's config surface
  * (`integration-tests/src/data.rs:16-19`: target_partitions; FAIR-style
  * isolation comes from the scheduler pools here).
  */
object Sessions {

  /** Apply graft's required configs to a session builder.
    *
    * @param cpus parallelism — also used for `spark.sql.shuffle.partitions`
    *             so small-SF local runs don't pay 200-partition scheduling
    *             overhead; at cluster scale this is sized to executor count.
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 otherwise throws
      // PARQUET_TYPE_ILLEGAL (see Tables.t scaladoc).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // FAIR pools: a CPU-pinned query must not starve health checks
      // (reference `dist/src/executor.rs:26-108`, `tests/exception.rs:96-103`).
      .config("spark.scheduler.mode", "FAIR")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
