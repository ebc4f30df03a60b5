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
  * Offsets are [[SnapshotKeyOffset]] commit keys (sequence number +
  * snapshot id — stable under snapshot expiry, unlike positional list
  * indices); batches replay deterministically from any (start, end] pair.
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

/** Stream position = the COMMIT KEY of the last snapshot seen:
  * `(sequenceNumber, snapshotId)` lexicographic. Sequence numbers are
  * monotonic per v2 commit; the id breaks ties for pre-sequence (v1)
  * metadata, whose ids this engine assigns monotonically. Keys are
  * STABLE under [[graft.ops.Maintenance.expireSnapshots]]: expiry
  * removes list entries but never renumbers survivors, so a checkpointed
  * range `(start, end]` always selects the same surviving snapshots —
  * positional indices would shift and replay wrong batches. */
final case class SnapshotKeyOffset(seq: Long, id: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq,"id":$id}"""
}

object SnapshotKeyOffset {
  val zero: SnapshotKeyOffset = SnapshotKeyOffset(0L, 0L)

  def key(s: graft.meta.Snapshot): (Long, Long) = (s.sequenceNumber, s.snapshotId)

  def latest(tableDir: String): SnapshotKeyOffset =
    try {
      IcebergMeta.load(tableDir).snapshots
        .map(key).maxOption
        .map { case (q, i) => SnapshotKeyOffset(q, i) }.getOrElse(zero)
    } catch { case _: Exception => zero } // table may not exist yet; retry next trigger

  def parse(json: String): SnapshotKeyOffset = {
    val nums = """-?\d+""".r.findAllIn(json).map(_.toLong).toSeq
    if (nums.size >= 2) SnapshotKeyOffset(nums(0), nums(1)) else zero
  }

  /** Snapshots with `start < key <= end`, in key order. */
  def slice(snaps: Seq[graft.meta.Snapshot], start: SnapshotKeyOffset,
      end: SnapshotKeyOffset): Seq[graft.meta.Snapshot] = {
    import scala.math.Ordering.Implicits._
    val lo = (start.seq, start.id); val hi = (end.seq, end.id)
    snaps.filter(s => key(s) > lo && key(s) <= hi).sortBy(key)
  }
}

final class SnapshotWatchStream(tableDir: String)
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
    if ((e.seq, e.id) == (s.seq, s.id)) Array.empty
    else Array(SnapshotRangePartition(tableDir, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SnapshotRangePartition]
      val rows = SnapshotKeyOffset.slice(
        IcebergMeta.load(p.tableDir).snapshots, p.from, p.until).iterator
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

final case class SnapshotRangePartition(tableDir: String,
    from: SnapshotKeyOffset, until: SnapshotKeyOffset) extends InputPartition
