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

import graft.meta.{IcebergMeta, IcebergTable}

/** Structured Streaming CHANGELOG source: each micro-batch emits the
  * per-snapshot added/deleted FILE rows of the snapshots committed since
  * the last trigger — the streaming twin of the batch
  * [[graft.ops.MetaDiff.changes]] scan (and the streaming-native upgrade
  * of the reference's diff-on-poll loop, ref `cli.py:959-1023` +
  * `formatters.py:1051-1111`).
  *
  * Offsets are snapshot-log indices (append-only, monotonic), so ranges
  * replay deterministically: batch (s, e] recomputes the same diffs from
  * the immutable snapshot metadata.
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

final class ChangelogStream(tableDir: String) extends MicroBatchStream {
  private def snapshotCount(): Int =
    try IcebergMeta.load(tableDir).snapshots.size
    catch { case _: Exception => 0 }

  override def initialOffset(): Offset = SnapshotIndexOffset(0)
  override def latestOffset(): Offset = SnapshotIndexOffset(snapshotCount())
  override def deserializeOffset(json: String): Offset =
    SnapshotIndexOffset("""\d+""".r.findFirstIn(json).map(_.toInt).getOrElse(0))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotIndexOffset].index
    val e = end.asInstanceOf[SnapshotIndexOffset].index
    if (e <= s) Array.empty
    // one partition per snapshot: diffs of independent snapshots read
    // their manifests in parallel across executor threads
    else (s until e).map(i => SnapshotRangePartition(tableDir, i, i + 1)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SnapshotRangePartition]
      val t = IcebergTable.load(p.tableDir)
      val rows = t.metadata.snapshots.slice(p.from, p.until)
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
