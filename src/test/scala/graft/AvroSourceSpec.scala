package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The self-contained Avro DataSource V2 (reference `AvroScanExecNode`,
  * datafusion.proto:1041-1043): type fidelity both directions, sync-marker
  * block splitting (one big file → many input partitions), column-pruning
  * pushdown, and overwrite semantics. */
class AvroSourceSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_avro_spec").toString + "/t"

  test("roundtrip preserves schema and values across the full type surface") {
    import spark.implicits._
    val dir = tmp()
    val df = spark.range(0, 100, 1, 4).select(
      col("id"),
      col("id").cast("int").as("i"),
      (col("id") % 2 === 0).as("flag"),
      col("id").cast("double").divide(8).as("d"),
      col("id").cast("float").as("f"),
      concat(lit("row-"), col("id")).as("s"),
      col("id").cast("decimal(12,3)").multiply(lit("1.5").cast("decimal(4,2)")).as("dec"),
      date_add(lit(java.sql.Date.valueOf("2024-03-01")), col("id").cast("int")).as("dt"),
      to_timestamp(lit("2024-03-01 10:30:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, id)")).as("ts"),
      when(col("id") % 3 === 0, lit(null).cast("long")).otherwise(col("id") * 7).as("n"),
      array(col("id").cast("float"), col("id").cast("float") * 2).as("emb"))
    df.write.mode("append").format("graft-avro").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(b.length == 100)
    assert(a.toSeq == b.toSeq)
  }

  test("one container file splits into many input partitions by byte range") {
    val dir = tmp()
    // One writer task -> one .avro file with many sync blocks.
    spark.range(0, 200000, 1, 1)
      .select(col("id"), concat(lit("pad-pad-pad-pad-pad-"), col("id")).as("s"))
      .write.mode("append").format("graft-avro").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, files.mkString(","))
    assert(files.head.length() > 256 * 1024, s"file too small to split: ${files.head.length()}")
    val read = spark.read.format("graft-avro")
      .option("maxBytesPerPartition", (64 * 1024).toString).load(dir)
    val parts = read.rdd.getNumPartitions
    assert(parts > 1, s"expected multi-partition scan of one file, got $parts")
    // Every row exactly once across splits (no block double-owned or lost).
    assert(read.count() == 200000)
    assert(read.agg(sum("id")).head.getLong(0) == (0L until 200000L).sum)
  }

  test("column pruning reaches the scan") {
    val dir = tmp()
    spark.range(0, 1000, 1, 2)
      .select(col("id"), concat(lit("v"), col("id")).as("a"), lit(3.14).as("b"))
      .write.mode("append").format("graft-avro").save(dir)
    val pruned = spark.read.format("graft-avro").load(dir).select("id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("columns: id"), plan) // AvroScan.description after pushdown
    assert(pruned.count() == 1000)
  }

  test("overwrite replaces previous contents; append adds files") {
    val dir = tmp()
    spark.range(0, 10).select(col("id")).write.mode("append").format("graft-avro").save(dir)
    spark.range(100, 105).select(col("id"))
      .write.mode("overwrite").format("graft-avro").save(dir)
    val afterOverwrite = spark.read.format("graft-avro").load(dir)
    assert(afterOverwrite.count() == 5)
    assert(afterOverwrite.agg(min("id")).head.getLong(0) == 100L)
    spark.range(200, 203).select(col("id"))
      .write.mode("append").format("graft-avro").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 8)
  }

  test("writes stage under _temporary; orphans there are invisible to readers") {
    val dir = tmp()
    spark.range(0, 20).select(col("id")).write.mode("append").format("graft-avro").save(dir)
    val root = new java.io.File(dir)
    // Job commit promoted every part file and removed the staging dir.
    assert(!root.listFiles.exists(_.getName == "_temporary"),
      "staging dir must be cleaned up at job commit")
    assert(root.listFiles.exists(_.getName == "_SUCCESS"))
    // A crashed attempt's orphan (no task abort, no job cleanup yet) sits
    // in staging — readers must not count its rows as committed data.
    val staging = new java.io.File(root, "_temporary/deadbeef")
    assert(staging.mkdirs())
    val committed = root.listFiles.filter(_.getName.endsWith(".avro")).head
    java.nio.file.Files.copy(committed.toPath,
      new java.io.File(staging, "part-99999-0.avro").toPath)
    assert(spark.read.format("graft-avro").load(dir).count() == 20,
      "orphan staged file leaked into the committed dataset")
  }
}
