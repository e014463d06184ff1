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

/** `store_occupancy` as a refresh-on-scan DataSource V2 table — the SQL
  * face of the content-keyed temp-store registry
  * ([[graft.Tables.storeRegistry]]): one row per live persisted store
  * (pair edges, shingle index, tokenizer trainers, ANN ground truth, …)
  * with its on-disk bytes and LRU access sequence, plus the eviction
  * counter surfaced as the `evictions` column (constant across rows,
  * like a grand-total footer — keeps the view one relation).
  *
  * Same discipline as [[GridDecisionsSource]]: the snapshot is taken in
  * `planInputPartitions`, so every query over the view sees occupancy as
  * of that query — an operator of a long-lived gateway JVM polls
  * `SELECT store, count(*), sum(bytes) FROM store_occupancy GROUP BY 1`
  * and watches the LRU budget ([[graft.Tables.storeCountCap]] /
  * [[graft.Tables.storeBytesCap]]) hold as corpora come and go. The
  * registry is process-global, so no runtime id is needed.
  */
final class StoreOccupancySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-store-occupancy"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StoreOccupancySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new StoreOccupancyTable
}

object StoreOccupancySource {
  val schema: StructType = StructType(Seq(
    StructField("store", StringType, nullable = false),
    StructField("corpus_key", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("last_access_seq", LongType, nullable = false),
    StructField("count_cap", IntegerType, nullable = false),
    StructField("bytes_cap", LongType, nullable = false),
    StructField("evictions", LongType, nullable = false)))
}

private[gateway] final class StoreOccupancyTable extends Table with SupportsRead {
  override def name(): String = "store_occupancy"
  override def schema(): StructType = StoreOccupancySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new StoreOccupancyScan
    }
}

private[gateway] final class StoreOccupancyScan extends Scan with Batch {
  override def readSchema(): StructType = StoreOccupancySource.schema
  override def toBatch: Batch = this
  override def description(): String = "graft store_occupancy refresh-on-scan"

  /** Called per query execution — the refresh point. */
  override def planInputPartitions(): Array[InputPartition] = {
    val caps = (graft.Tables.storeCountCap, graft.Tables.storeBytesCap,
      graft.Tables.storeEvictions.get())
    Array(StoreOccupancyPartition(
      graft.Tables.storeOccupancySnapshot.sortBy(r => (r._1, r._2)), caps))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val part = p.asInstanceOf[StoreOccupancyPartition]
        new PartitionReader[InternalRow] {
          private val it = part.rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            if (!it.hasNext) return false
            val (store, key, bytes, seq) = it.next()
            cur = new GenericInternalRow(Array[Any](
              UTF8String.fromString(store), UTF8String.fromString(key),
              bytes, seq, part.caps._1, part.caps._2, part.caps._3))
            true
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

/** One partition carrying the driver-snapped occupancy rows + caps. */
private[gateway] final case class StoreOccupancyPartition(
    rows: Seq[(String, String, Long, Long)], caps: (Int, Long, Long))
  extends InputPartition
