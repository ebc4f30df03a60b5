package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.IcebergMeta

/** Structured Streaming source for `snapshots --watch` (ref
  * `cli.py:959-1023`): each micro-batch emits the snapshots appended to the
  * table's metadata since the last trigger — the streaming-native upgrade
  * of the reference's poll-and-set-difference loop (SURVEY §2.8).
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.streaming.SnapshotWatchProvider")
  *   .option("tableDir", "/path/to/warehouse/ns/table")
  *   .load()                       // snapshot_id, timestamp_ms, operation, manifest_list
  *   .writeStream.trigger(Trigger.ProcessingTime("5 seconds")) ...
  * }}}
  *
  * Offsets are the count of snapshots observed in the metadata log
  * (append-only, so the index is a valid monotonic offset); batches replay
  * deterministically from any (start, end] index pair.
  */
class SnapshotWatchProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotWatch.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SnapshotWatchTable(properties.get("tableDir"))
}

object SnapshotWatch {
  val schema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("manifest_list", StringType, nullable = false)))
}

final class SnapshotWatchTable(tableDir: String) extends Table with SupportsRead {
  require(tableDir != null, "option 'tableDir' is required")
  override def name(): String = s"snapshot_watch($tableDir)"
  override def schema(): StructType = SnapshotWatch.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SnapshotWatch.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SnapshotWatchStream(tableDir)
      }
    }
}

final case class SnapshotIndexOffset(index: Int) extends Offset {
  override def json(): String = s"""{"index":$index}"""
}

final class SnapshotWatchStream(tableDir: String) extends MicroBatchStream {
  private def snapshotCount(): Int =
    try IcebergMeta.load(tableDir).snapshots.size
    catch { case _: Exception => 0 } // table may not exist yet; retry next trigger

  override def initialOffset(): Offset = SnapshotIndexOffset(0)
  override def latestOffset(): Offset = SnapshotIndexOffset(snapshotCount())
  override def deserializeOffset(json: String): Offset =
    SnapshotIndexOffset("""\d+""".r.findFirstIn(json).map(_.toInt).getOrElse(0))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotIndexOffset].index
    val e = end.asInstanceOf[SnapshotIndexOffset].index
    if (e <= s) Array.empty
    else Array(SnapshotRangePartition(tableDir, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SnapshotRangePartition]
      val rows = IcebergMeta.load(p.tableDir).snapshots
        .slice(p.from, p.until).iterator
      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) {
            val s = rows.next()
            current = InternalRow(
              s.snapshotId, s.timestampMs,
              UTF8String.fromString(s.operation),
              UTF8String.fromString(s.manifestList))
            true
          } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class SnapshotRangePartition(tableDir: String, from: Int, until: Int)
  extends InputPartition
