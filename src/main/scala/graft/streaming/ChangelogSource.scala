package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.{IcebergMeta, IcebergTable}

/** Structured Streaming CHANGELOG source: each micro-batch emits the
  * per-snapshot added/deleted FILE rows of the snapshots committed since
  * the last trigger — the streaming twin of the batch
  * [[graft.ops.MetaDiff.changes]] scan (and the streaming-native upgrade
  * of the reference's diff-on-poll loop, ref `cli.py:959-1023` +
  * `formatters.py:1051-1111`).
  *
  * Offsets are [[SnapshotKeyOffset]] commit keys (sequence number +
  * snapshot id — stable under snapshot expiry), so ranges replay
  * deterministically: batch (s, e] recomputes the same diffs from the
  * immutable snapshot metadata; expired snapshots simply drop out.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.streaming.ChangelogProvider")
  *   .option("tableDir", "/path/to/warehouse/ns/table")
  *   .load()  // snapshot_id, timestamp_ms, operation, change, file_path,
  *            //   record_count, file_size_in_bytes
  * }}}
  */
class ChangelogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Changelog.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangelogTable(properties.get("tableDir"))
}

object Changelog {
  val schema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("change", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false)))

  /** Per-snapshot file-level diff vs the parent, as plain rows (runs in
    * the partition reader — metadata-scale, no session needed). */
  def diffRows(t: IcebergTable, s: graft.meta.Snapshot): Seq[InternalRow] = {
    val cur = t.files(Some(s.snapshotId))
    val prev = s.parentSnapshotId.toSeq.flatMap(p =>
      try t.files(Some(p))
      catch { case _: NoSuchElementException => Seq.empty }) // parent expired
    val curPaths = cur.map(_.filePath).toSet
    val prevPaths = prev.map(_.filePath).toSet
    def row(change: String, e: graft.meta.DataFileEntry): InternalRow =
      InternalRow(
        s.snapshotId, s.timestampMs,
        UTF8String.fromString(s.operation),
        UTF8String.fromString(change),
        UTF8String.fromString(e.filePath),
        e.recordCount, e.fileSizeInBytes)
    cur.filterNot(e => prevPaths.contains(e.filePath)).sortBy(_.filePath)
      .map(row("added", _)) ++
      prev.filterNot(e => curPaths.contains(e.filePath)).sortBy(_.filePath)
        .map(row("deleted", _))
  }
}

final class ChangelogTable(tableDir: String) extends Table with SupportsRead {
  require(tableDir != null, "option 'tableDir' is required")
  override def name(): String = s"changelog($tableDir)"
  override def schema(): StructType = Changelog.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Changelog.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ChangelogStream(tableDir)
      }
    }
}

final class ChangelogStream(tableDir: String)
  extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow: drain to the offset pinned at query start
  private var pinnedEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinnedEnd = Some(SnapshotKeyOffset.latest(tableDir))
  override def reportLatestOffset(): Offset = SnapshotKeyOffset.latest(tableDir)
  // SupportsAdmissionControl (parent trait): no rate limiting — a batch
  // is a set of whole commits, so the limit-aware form delegates
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def initialOffset(): Offset = SnapshotKeyOffset.zero
  override def latestOffset(): Offset =
    pinnedEnd.getOrElse(SnapshotKeyOffset.latest(tableDir))
  override def deserializeOffset(json: String): Offset = SnapshotKeyOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotKeyOffset]
    val e = end.asInstanceOf[SnapshotKeyOffset]
    // one partition per snapshot, addressed by STABLE snapshot id (not a
    // list position — expiry renumbers positions but never ids): diffs of
    // independent snapshots read their manifests in parallel across
    // executor threads
    SnapshotKeyOffset.slice(IcebergMeta.load(tableDir).snapshots, s, e)
      .map(sn => ChangelogSnapshotPartition(tableDir, sn.snapshotId)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChangelogSnapshotPartition]
      val t = IcebergTable.load(p.tableDir)
      // a snapshot expired between planning and reading yields no rows
      // (its diff is unrecoverable once the metadata is gone)
      val rows = t.metadata.snapshots.filter(_.snapshotId == p.snapshotId)
        .iterator.flatMap(s => Changelog.diffRows(t, s))
      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) { current = rows.next(); true } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class ChangelogSnapshotPartition(tableDir: String, snapshotId: Long)
  extends InputPartition
