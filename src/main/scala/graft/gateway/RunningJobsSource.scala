package graft.gateway

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `running_jobs` as a refresh-on-scan DataSource V2 table.
  *
  * The reference's `RunningJobsTable.scan` re-reads the job registry on
  * EVERY scan (`integration-tests/app/src/table.rs:43-60`: `get_all_jobs`
  * inside `scan`, then a throwaway MemTable). The temp-view snapshot this
  * replaces baked the registry state in at registration — `SELECT * FROM
  * running_jobs` could silently serve stale rows. Here the snapshot is
  * taken in `planInputPartitions`, which Spark calls during the physical
  * planning of each query execution, so every query over the view sees the
  * registry as of that query — no re-registration footgun.
  *
  * The registry is driver-local, so the freshly snapped rows ride inside
  * the single [[RunningJobsPartition]] to wherever the task runs — the
  * same shape as Spark's own LocalTableScan, but re-snapped per scan.
  */
final class RunningJobsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-running-jobs"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RunningJobsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val id = Option(properties.get("runtimeId")).getOrElse(
      throw new IllegalArgumentException(
        "graft-running-jobs requires a runtimeId option (from JobRuntime.runtimeId)"))
    new RunningJobsTable(id)
  }
}

object RunningJobsSource {
  /** Reference schema, `dist/src/util.rs:148-158`. */
  val schema: StructType = StructType(Seq(
    StructField("job_id", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("job_meta", StringType, nullable = false),
    StructField("stages", StringType, nullable = false)))

  /** Live runtimes by id — how a reflectively-instantiated provider finds
    * the driver-local registry its table observes. Entries are added by
    * [[JobRuntime]] construction and removed on close. */
  private[gateway] val runtimes = new TrieMap[String, JobRuntime]()
}

private[gateway] final class RunningJobsTable(runtimeId: String)
  extends Table with SupportsRead {
  override def name(): String = s"running_jobs($runtimeId)"
  override def schema(): StructType = RunningJobsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new RunningJobsScan(runtimeId)
    }
}

private[gateway] final class RunningJobsScan(runtimeId: String)
  extends Scan with Batch {
  override def readSchema(): StructType = RunningJobsSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft running_jobs refresh-on-scan (runtime $runtimeId)"

  /** Called per query execution — the refresh point. */
  override def planInputPartitions(): Array[InputPartition] = {
    val rt = RunningJobsSource.runtimes.getOrElse(runtimeId,
      throw new IllegalStateException(
        s"gateway runtime $runtimeId is closed; running_jobs is gone with it"))
    Array(RunningJobsPartition(rt.runningJobsSnapshot()))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[RunningJobsPartition].rows
        new PartitionReader[InternalRow] {
          private val it = rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val (jobId, createdAtMs, meta, stages) = it.next()
            cur = new GenericInternalRow(Array[Any](
              UTF8String.fromString(jobId),
              createdAtMs * 1000L, // ms -> micros
              UTF8String.fromString(meta),
              UTF8String.fromString(stages)))
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

/** One partition carrying the driver-snapped registry rows
  * (job_id, created_at ms, job_meta JSON, stages JSON). */
private[gateway] final case class RunningJobsPartition(
    rows: Seq[(String, Long, String, String)]) extends InputPartition
