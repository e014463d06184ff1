package graft.gateway

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `grid_decisions` as a refresh-on-scan DataSource V2 table — the SQL
  * face of the dedup grids' occupancy-decision registry
  * ([[graft.Sessions.gridHistory]]; decisions are produced by the
  * query-execution listener from each grid's `observe()` witness).
  *
  * Same discipline as [[RunningJobsSource]] (the reference re-reads its
  * registry on EVERY scan, `integration-tests/app/src/table.rs:43-60`):
  * the snapshot is taken in `planInputPartitions`, so every query over
  * the view sees the decisions as of that query — a monitoring dashboard
  * polls `SELECT * FROM grid_decisions WHERE regime <> 'linear'` and sees
  * escalations the moment the listener records them, no re-registration.
  * The registry is process-global, so no runtime id is needed.
  *
  * Rows come from the bounded per-site decision HISTORY
  * ([[graft.Sessions.gridHistory]] — since ADVICE r10 the ONLY store;
  * the router's latest-wins lookup derives from its newest entry): an
  * escalation that later clears stays visible to a dashboard that polls
  * less often than queries run (VERDICT r9 #5). `seq` is the
  * process-monotonic record order (`observed_at` wall-clock can tie
  * inside one ms); the latest decision for a site is its max-`seq` row.
  */
final class GridDecisionsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-grid-decisions"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridDecisionsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GridDecisionsTable
}

object GridDecisionsSource {
  val schema: StructType = StructType(Seq(
    StructField("site", StringType, nullable = false),
    StructField("max_bucket", IntegerType, nullable = false),
    StructField("grid_b", IntegerType, nullable = false),
    StructField("regime", StringType, nullable = false),
    StructField("recommendation", StringType, nullable = true),
    StructField("observed_at", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false)))
}

private[gateway] final class GridDecisionsTable extends Table with SupportsRead {
  override def name(): String = "grid_decisions"
  override def schema(): StructType = GridDecisionsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GridDecisionsScan
    }
}

private[gateway] final class GridDecisionsScan extends Scan with Batch {
  override def readSchema(): StructType = GridDecisionsSource.schema
  override def toBatch: Batch = this
  override def description(): String = "graft grid_decisions refresh-on-scan"

  /** Called per query execution — the refresh point. */
  override def planInputPartitions(): Array[InputPartition] = {
    val snap = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Int, String, Option[String], Long, Long)]
    graft.Sessions.gridHistory.forEach((_, hist) =>
      hist.foreach { o =>
        val d = o.decision
        snap += ((d.site, d.maxBucket, d.gridB, d.regime, d.recommendation,
          o.observedAtMs, o.seq))
      })
    Array(GridDecisionsPartition(snap.toSeq.sortBy(r => (r._1, r._7))))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[GridDecisionsPartition].rows
        new PartitionReader[InternalRow] {
          private val it = rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val (site, n, b, regime, rec, atMs, seq) = it.next()
            cur = new GenericInternalRow(Array[Any](
              UTF8String.fromString(site), n, b,
              UTF8String.fromString(regime),
              rec.map(UTF8String.fromString).orNull,
              atMs * 1000L, seq))
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

/** One partition carrying the driver-snapped decision rows. */
private[gateway] final case class GridDecisionsPartition(
    rows: Seq[(String, Int, Int, String, Option[String], Long, Long)])
  extends InputPartition
