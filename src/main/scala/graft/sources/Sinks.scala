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
  * Avro (`AvroScanExecNode`, proto:1041-1043) is not available: the
  * spark-avro connector jar is not in this zero-egress image — documented
  * gap, wire-supported but untested in the reference too.
  */
object Sinks {
  private def roundtrip(fmt: String)(s: SparkSession, d: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft_sink_$fmt").toString
    val src = Tables.t(s, d, "nation")
    val out = s"$dir/nation"
    fmt match {
      case "parquet" =>
        src.write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      case "csv" =>
        src.write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true").schema(src.schema).csv(out)
      case "json" =>
        src.write.mode("overwrite").json(out)
        s.read.schema(src.schema).json(out)
    }
  }

  private def q(fmt: String) = QueryDef(
    s"q_sink_${fmt}_roundtrip",
    (s, d) => roundtrip(fmt)(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))

  val all: Seq[QueryDef] = Seq(q("parquet"), q("csv"), q("json"))
}
