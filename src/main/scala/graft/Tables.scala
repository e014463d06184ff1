package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All query builders take `(spark, sfDir)` and read through here, so the
  * scan is always a parquet `FileSourceScanExec` with predicate pushdown and
  * column pruning available to Catalyst. At cluster scale the same code reads
  * a directory of many files — nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp (PARQUET_TYPE_ILLEGAL). Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.configure]]),
    * which surfaces the column as ns-since-epoch LONG. Ordering/grouping on
    * the long is identical to ordering on the ns timestamp, so oracle
    * queries that only use `ts` for ORDER BY stay comparable with DuckDB
    * (which reads it as TIMESTAMP_NS). Never output raw `ts`.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register exactly the named tables as temp views (SQL-form queries).
    * Deliberately NOT all tables: an eager register-everything forces a read
    * of every file's footer per query — wasteful, and one bad table poisons
    * unrelated queries (round-1 ERR root cause, VERDICT.md "What's wrong" #1).
    */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Register every table as a temp view. Kept for interactive use; query
    * builders should use [[register]] with the tables they need. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)

  /** Content-derived cache token for a parquet path: (leaf-file count, total
    * bytes, max mtime) over every regular file under the path. Unlike a bare
    * `lastModified` on the top-level path, this changes when part-files are
    * rewritten in place inside a directory, and a not-yet-existing path
    * yields a distinct "absent" token instead of a constant 0 that would pin
    * a stale entry forever. Used to key JVM-lifetime caches (shingle index,
    * IVF centroids) so regenerated data at the same path is re-derived. */
  def contentToken(path: String): String = {
    val root = new java.io.File(path)
    if (!root.exists()) return s"${root.getCanonicalPath}#absent"
    var n = 0L; var bytes = 0L; var maxM = 0L
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      else { n += 1; bytes += f.length(); maxM = math.max(maxM, f.lastModified()) }
    walk(root)
    s"${root.getCanonicalPath}#$n#$bytes#$maxM"
  }
}
