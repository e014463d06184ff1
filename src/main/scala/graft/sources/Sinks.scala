package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File sink/source roundtrips — the reference's `CsvSinkExecNode` /
  * `JsonSinkExecNode` / `ParquetSinkExecNode` (proto:768-797, FileSinkConfig
  * proto:743-753) and the matching scan nodes (proto:1012-1039). Each query
  * writes a table through the format and reads it back, so the oracle is
  * simply the original table: a value-level roundtrip proof.
  *
  * Avro (`AvroScanExecNode`, proto:1041-1043) runs through our own
  * DataSource V2 connector ([[graft.sources.avro.AvroDataSource]]) built
  * on the Avro core library — the spark-avro connector jar does not exist
  * in this zero-egress image.
  */
object Sinks {
  /** One JVM-wide root for roundtrip outputs, reclaimed on shutdown (the
    * shingle-index policy, Dedup.scala): repeated verify/bench passes
    * overwrite the same per-format directory instead of leaking a fresh
    * temp dir per invocation — a long-lived gateway no longer grows /tmp
    * without bound. (These are sequential correctness-gate queries; the
    * write is `overwrite`, so re-invocation is a clean in-place rewrite.) */
  private lazy val sinkRoot: String = {
    val dir = Files.createTempDirectory("graft-sink-roundtrips")
    sys.addShutdownHook {
      scala.reflect.io.Path(dir.toFile).deleteRecursively()
      ()
    }
    dir.toString
  }

  private def roundtrip(fmt: String)(s: SparkSession, d: String): DataFrame = {
    val src = Tables.t(s, d, "nation")
    val out = s"$sinkRoot/$fmt/nation"
    fmt match {
      case "parquet" =>
        src.write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      case "orc" =>
        src.write.mode("overwrite").orc(out)
        s.read.orc(out)
      case "csv" =>
        src.write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true").schema(src.schema).csv(out)
      case "json" =>
        src.write.mode("overwrite").json(out)
        s.read.schema(src.schema).json(out)
      case "xml" =>
        // Built into Spark 4 (formerly the spark-xml connector).
        src.write.mode("overwrite").option("rowTag", "nation").format("xml").save(out)
        s.read.option("rowTag", "nation").schema(src.schema).format("xml").load(out)
      case "avro" =>
        src.write.mode("overwrite").format("graft-avro").save(out)
        s.read.format("graft-avro").load(out)
      case "text" =>
        // Line-oriented text: one JSON line per row — delimiter- and
        // NULL-safe (a hand-rolled '|' format would shift fields on NULLs
        // and corrupt on delimiter-bearing strings), and the rawest scan
        // shape there is (log shipping, WET dumps).
        src.select(to_json(struct(src.columns.map(col): _*)).as("value"))
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .select(from_json(col("value"), src.schema).as("r"))
          .select(col("r.*"))
    }
  }

  private def q(fmt: String) = QueryDef(
    s"q_sink_${fmt}_roundtrip",
    (s, d) => roundtrip(fmt)(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))

  /** Partitioned sink + partition-pruned scan (`FileSinkConfig.table_
    * partition_cols`, proto:743-753): write orders hive-partitioned by
    * order year, read back with a year predicate. At 100 TB this is THE
    * layout decision — the filter prunes whole directories before any IO
    * (PlanSpec asserts PartitionFilters is populated). */
  private val partitionedSink = QueryDef(
    "q_sink_partitioned",
    (s, d) => {
      val dir = s"$sinkRoot/partitioned"
      Tables.t(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders")
      s.read.parquet(s"$dir/orders")
        .filter(col("o_year") === 1995)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY o_orderstatus"""))

  val all: Seq[QueryDef] =
    Seq(q("parquet"), q("orc"), q("csv"), q("json"), q("xml"), q("text"),
      q("avro"), partitionedSink)
}
