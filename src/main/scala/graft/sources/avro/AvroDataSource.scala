package graft.sources.avro

import java.util.{Collections, OptionalLong}
import scala.jdk.CollectionConverters._

import org.apache.avro.{Conversions, LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Avro scan/sink as a Spark DataSource V2 — closes the reference's
  * `AvroScanExecNode` row (`networks/tonic/gen/proto/datafusion.proto:
  * 1041-1043`). The spark-avro connector jar does not exist in this
  * zero-egress image, so this is a self-contained connector on the Avro
  * core library that ships inside the Spark distribution
  * (`/opt/spark/jars/avro-1.12.1.jar`, `avro-mapred` for Hadoop-path
  * seekable inputs) — public APIs only, no Spark `private[sql]` internals.
  *
  * Scale design:
  *  - **Reads split inside files**: Avro container files are chains of
  *    sync-marker-delimited blocks, so one file yields many input
  *    partitions (`reader.sync(start)` / `pastSync(end)`), bounded by
  *    `maxBytesPerPartition` (defaults to `spark.sql.files.maxPartitionBytes`
  *    semantics, 128 MiB). A single 10 GB avro file fans out across the
  *    cluster instead of pinning one task.
  *  - **Column pruning is pushed down** (SupportsPushDownRequiredColumns):
  *    Avro is row-major so pruning saves decode + row width, not IO —
  *    still the difference between shipping 2 and 200 columns upstream.
  *  - **Writes are executor-local**: each task streams its partition
  *    through a `DataFileWriter` directly to the target filesystem
  *    (one `part-<split>-<task>.avro` per task, `_SUCCESS` on commit) —
  *    no driver funnel, same layout contract as Spark's parquet sink.
  *
  * Type surface (both directions): boolean, int, long, float, double,
  * string, binary, decimal (bytes + logical decimal), date (int + logical
  * date), timestamp (long + logical timestamp-micros), and arrays of the
  * above; nullability via `union(null, T)`.
  */
final class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: java.util.Map[String, String]): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro requires a path"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val conf = AvroConnector.sessionConf()
    val files = AvroConnector.listAvroFiles(path, conf)
    if (files.isEmpty)
      throw new IllegalArgumentException(s"no .avro files under $path")
    val in = new FsInput(files.head.getPath, conf)
    val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try AvroConnector.toSparkSchema(reader.getSchema)
    finally reader.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AvroTable(pathOf(properties), schema)
}

final class AvroTable(path: String, tableSchema: StructType)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema,
      Option(options.get("maxBytesPerPartition")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema())
}

// ---------------------------------------------------------------- read side

final class AvroScanBuilder(path: String, full: StructType, maxSplitBytes: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required, maxSplitBytes)
}

final class AvroScan(path: String, required: StructType, maxSplitBytes: Long)
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro scan $path (columns: ${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = AvroConnector.sessionConf()
    val files = AvroConnector.listAvroFiles(path, conf)
    // Sync-marker block splitting: byte ranges, like parquet row-group
    // assignment. Ranges are aligned by the reader, not here.
    files.flatMap { f =>
      val len = f.getLen
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map { i =>
        val start = i * maxSplitBytes
        AvroInputPartition(f.getPath.toString, start,
          math.min(maxSplitBytes, len - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroPartitionReaderFactory(required,
      new SerializableConfiguration(AvroConnector.sessionConf()))

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = {
      val files = AvroConnector.listAvroFiles(path, AvroConnector.sessionConf())
      OptionalLong.of(files.map(_.getLen).sum)
    }
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

final case class AvroInputPartition(file: String, start: Long, length: Long)
  extends InputPartition

final class AvroPartitionReaderFactory(required: StructType,
    conf: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new AvroPartitionReader(p, required, conf.value)
  }
}

/** Reads one byte range of one container file: seek to the first sync
  * marker at/after `start`, stop once past `start + length` — each block
  * is owned by exactly one split (the standard Hadoop input-split
  * contract, which is what makes a big avro file cluster-parallel). */
final class AvroPartitionReader(p: AvroInputPartition, required: StructType,
    conf: Configuration)
  extends PartitionReader[InternalRow] {
  private val reader = {
    val r = DataFileReader.openReader(
      new FsInput(new Path(p.file), conf), new GenericDatumReader[GenericRecord]())
      .asInstanceOf[DataFileReader[GenericRecord]]
    r.sync(p.start)
    r
  }
  private val converter = AvroConnector.recordToRow(reader.getSchema, required)
  private var row: InternalRow = _

  override def next(): Boolean =
    if (reader.hasNext && !reader.pastSync(p.start + p.length)) {
      row = converter(reader.next())
      true
    } else false

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

// --------------------------------------------------------------- write side

final class AvroWriteBuilder(path: String, schema: StructType)
  extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AvroBatchWrite(path, schema, overwrite)
  }
}

/** File-sink commit protocol (the shape of Spark's own file sources):
  * tasks stage part files under `<dir>/_temporary/<writeId>/`; job
  * `commit` moves the WINNING attempts' files into the final directory
  * and writes `_SUCCESS`; job `abort` deletes the whole staging dir.
  * Consequences the direct-write version got wrong:
  *  - a task attempt that dies without `abort()` (executor crash, killed
  *    speculative loser) leaves its orphan in staging, never beside
  *    committed data — no duplicate rows on retry;
  *  - truncate-mode deletes the previous dataset only inside job commit,
  *    after every task succeeded — a failed overwrite leaves the old data
  *    intact.
  * Readers never see staging: [[AvroConnector.listAvroFiles]] lists only
  * top-level files. */
final class AvroBatchWrite(path: String, schema: StructType, overwrite: Boolean)
  extends BatchWrite {
  private val writeId = java.util.UUID.randomUUID().toString
  private def stagingDir = new Path(path, s"_temporary/$writeId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    AvroDataWriterFactory(stagingDir.toString, schema,
      new SerializableConfiguration(AvroConnector.sessionConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroConnector.sessionConf()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    if (overwrite && fs.exists(target)) {
      // Deferred truncate: drop previously committed data (top-level files
      // only — staging lives in _temporary) now that the new write is
      // known-good and its files are all staged.
      fs.listStatus(target).filter(_.isFile)
        .foreach(s => fs.delete(s.getPath, false))
    }
    fs.mkdirs(target)
    // Promote exactly the winning attempts' files; losers stay in staging.
    messages.foreach { case AvroWriteCommit(staged) =>
      val src = new Path(staged)
      if (!fs.rename(src, new Path(target, src.getName)))
        throw new java.io.IOException(s"commit: failed to promote $staged")
    }
    fs.delete(new Path(path, "_temporary"), true)
    fs.create(new Path(target, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroConnector.sessionConf()
    val staging = new Path(path, "_temporary")
    try staging.getFileSystem(conf).delete(staging, true)
    catch { case _: Throwable => () }
  }
}

final case class AvroDataWriterFactory(stagingDir: String, schema: StructType,
    conf: SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(stagingDir, schema, partitionId, taskId, conf.value)
}

final case class AvroWriteCommit(file: String) extends WriterCommitMessage

/** One task's partition → one container file, streamed (never buffered
  * whole) into the job's staging dir. Task files are named
  * part-<split>-<task>.avro so speculative / retried attempts never
  * collide; only the attempt whose commit message the driver accepts is
  * promoted out of staging. */
final class AvroDataWriter(dir: String, schema: StructType, partitionId: Int,
    taskId: Long, conf: Configuration)
  extends DataWriter[InternalRow] {
  private val avroSchema = AvroConnector.toAvroSchema(schema, "graft_row")
  private val file = new Path(dir, f"part-$partitionId%05d-$taskId.avro")
  private val out = {
    val fs = file.getFileSystem(conf)
    fs.mkdirs(new Path(dir))
    fs.create(file, true)
  }
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, out)
    w
  }
  private val converter = AvroConnector.rowToRecord(schema, avroSchema)

  override def write(record: InternalRow): Unit = writer.append(converter(record))
  override def commit(): WriterCommitMessage = { writer.close(); AvroWriteCommit(file.toString) }
  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    try file.getFileSystem(conf).delete(file, false)
    catch { case _: Throwable => () }
  }
  override def close(): Unit = ()
}

// ------------------------------------------------------------- conversions

object AvroConnector {
  private val decimalConversion = new Conversions.DecimalConversion()

  /** The active session's Hadoop configuration (credentials, custom
    * filesystem schemes, ...) for driver-side calls; executors receive it
    * via [[SerializableConfiguration]] in the reader/writer factories —
    * the same threading Spark's own file sources use. Falls back to a
    * plain Configuration only when no session is active (tests of the
    * conversion layer). */
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def listAvroFiles(path: String, conf: Configuration): Array[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Array.empty
    else if (fs.getFileStatus(p).isFile) Array(fs.getFileStatus(p))
    else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.toString)
  }

  /** Spark → Avro. Nullability becomes `union(null, T)`. */
  def toAvroSchema(schema: StructType, recordName: String): ASchema = {
    def field(dt: DataType): ASchema = dt match {
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case IntegerType => ASchema.create(ASchema.Type.INT)
      case LongType => ASchema.create(ASchema.Type.LONG)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case StringType => ASchema.create(ASchema.Type.STRING)
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(ASchema.create(ASchema.Type.BYTES))
      case ArrayType(elem, containsNull) =>
        ASchema.createArray(if (containsNull) nullable(field(elem)) else field(elem))
      case other => throw new UnsupportedOperationException(
        s"graft-avro does not support $other")
    }
    def nullable(s: ASchema): ASchema =
      ASchema.createUnion(java.util.List.of(ASchema.create(ASchema.Type.NULL), s))
    val fields = schema.fields.map { f =>
      val fs = if (f.nullable) nullable(field(f.dataType)) else field(f.dataType)
      new ASchema.Field(f.name, fs, null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }
    ASchema.createRecord(recordName, null, "graft", false, fields.toSeq.asJava)
  }

  /** Strip the `union(null, T)` wrapper. */
  private def nonNull(s: ASchema): (ASchema, Boolean) =
    if (s.getType == ASchema.Type.UNION) {
      val branch = s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).getOrElse(
        throw new UnsupportedOperationException("union with no non-null branch"))
      (branch, true)
    } else (s, false)

  /** Avro → Spark. */
  def toSparkSchema(schema: ASchema): StructType = {
    def dataType(s0: ASchema): (DataType, Boolean) = {
      val (s, nullable) = nonNull(s0)
      val dt = (s.getType, Option(s.getLogicalType)) match {
        case (ASchema.Type.BOOLEAN, _) => BooleanType
        case (ASchema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
        case (ASchema.Type.INT, _) => IntegerType
        case (ASchema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
        case (ASchema.Type.LONG, _) => LongType
        case (ASchema.Type.FLOAT, _) => FloatType
        case (ASchema.Type.DOUBLE, _) => DoubleType
        case (ASchema.Type.STRING, _) => StringType
        case (ASchema.Type.BYTES, Some(d: LogicalTypes.Decimal)) =>
          DecimalType(d.getPrecision, d.getScale)
        case (ASchema.Type.BYTES, _) => BinaryType
        case (ASchema.Type.ARRAY, _) =>
          val (elem, elemNullable) = dataType(s.getElementType)
          ArrayType(elem, elemNullable)
        case (t, _) => throw new UnsupportedOperationException(s"avro type $t")
      }
      (dt, nullable)
    }
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = dataType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  /** GenericRecord → InternalRow for the pruned `required` columns. */
  def recordToRow(recordSchema: ASchema, required: StructType): GenericRecord => InternalRow = {
    val positions = required.fields.map(f => recordSchema.getField(f.name).pos())
    val schemas = required.fields.map(f => recordSchema.getField(f.name).schema())
    record => {
      val values = new Array[Any](required.length)
      var i = 0
      while (i < required.length) {
        values(i) = fromAvro(record.get(positions(i)), schemas(i), required.fields(i).dataType)
        i += 1
      }
      new GenericInternalRow(values)
    }
  }

  private def fromAvro(v: Any, schema0: ASchema, dt: DataType): Any = {
    if (v == null) return null
    val (schema, _) = nonNull(schema0)
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType => v // int days / long micros pass through
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case d: DecimalType =>
        val logical = schema.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
        val bd = decimalConversion.fromBytes(
          v.asInstanceOf[java.nio.ByteBuffer], schema, logical)
        Decimal(bd, d.precision, d.scale)
      case ArrayType(elem, _) =>
        val list = v.asInstanceOf[java.util.Collection[AnyRef]]
        val out = new Array[Any](list.size())
        var i = 0
        val it = list.iterator()
        while (it.hasNext) { out(i) = fromAvro(it.next(), schema.getElementType, elem); i += 1 }
        new GenericArrayData(out)
      case other => throw new UnsupportedOperationException(s"read of $other")
    }
  }

  /** InternalRow → GenericRecord (write side). */
  def rowToRecord(schema: StructType, avroSchema: ASchema): InternalRow => GenericRecord = {
    val fieldSchemas = avroSchema.getFields.asScala.map(_.schema()).toArray
    row => {
      val rec = new GenericData.Record(avroSchema)
      var i = 0
      while (i < schema.length) {
        val v =
          if (row.isNullAt(i)) null
          else toAvro(row, i, schema.fields(i).dataType, fieldSchemas(i))
        rec.put(i, v)
        i += 1
      }
      rec
    }
  }

  private def toAvro(row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int, dt: DataType, schema0: ASchema): AnyRef = {
    val (schema, _) = nonNull(schema0)
    dt match {
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case LongType | TimestampType => java.lang.Long.valueOf(row.getLong(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case StringType => row.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case d: DecimalType =>
        decimalConversion.toBytes(
          row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal,
          schema, schema.getLogicalType)
      case ArrayType(elem, _) =>
        val arr: ArrayData = row.getArray(i)
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(if (arr.isNullAt(j)) null
            else toAvro(arr, j, elem, schema.getElementType))
          j += 1
        }
        out
      case other => throw new UnsupportedOperationException(s"write of $other")
    }
  }
}
