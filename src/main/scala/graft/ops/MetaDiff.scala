package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.IcebergTable
import graft.rel.MetaRelations

/** Snapshot diff (ref `collect_diff`, `formatters.py:1051-1111`): two
  * snapshot-pinned `files` relations, anti-joined on `file_path` both ways
  * (broadcast — metadata-small sides), plus per-side totals and nets.
  */
final case class DiffReport(
    added: DataFrame,
    deleted: DataFrame,
    totals: DataFrame,
    operation: String)

object MetaDiff {

  def diff(spark: SparkSession, t: IcebergTable, snap1: Long, snap2: Long): DiffReport = {
    // validate both ids exist up front (ref formatters.py:1053-1055)
    Seq(snap1, snap2).foreach { id =>
      if (t.metadata.snapshot(id).isEmpty)
        throw new NoSuchElementException(s"Snapshot $id not found")
    }
    val f1 = MetaRelations.files(spark, t, Some(snap1))
    val f2 = MetaRelations.files(spark, t, Some(snap2))

    val added = f2.join(broadcast(f1.select("file_path")), Seq("file_path"), "left_anti")
      .select("file_path", "partition", "record_count", "file_size_in_bytes")
      .orderBy("file_path")
    val deleted = f1.join(broadcast(f2.select("file_path")), Seq("file_path"), "left_anti")
      .select("file_path", "partition", "record_count", "file_size_in_bytes")
      .orderBy("file_path")

    def side(df: DataFrame, label: String): DataFrame =
      df.agg(
        lit(label).as("side"),
        count(lit(1)).as("files"),
        coalesce(sum(col("file_size_in_bytes")), lit(0L)).as("bytes"),
        coalesce(sum(col("record_count")), lit(0L)).as("records"))

    val a = side(added, "added")
    val d = side(deleted, "deleted")
    val totals = a.unionByName(d).unionByName(
      a.crossJoin(d.select(
          col("files").as("d_files"), col("bytes").as("d_bytes"),
          col("records").as("d_records")))
        .select(
          lit("net").as("side"),
          (col("files") - col("d_files")).as("files"),
          (col("bytes") - col("d_bytes")).as("bytes"),
          (col("records") - col("d_records")).as("records")))

    DiffReport(added, deleted, totals,
      t.metadata.snapshot(snap2).map(_.operation).getOrElse("unknown"))
  }

  /** Incremental changelog over the parent-pointer chain `(fromSnap,
    * toSnap]`: one row per (snapshot, change, file), where `change` is
    * `added` | `deleted`, ordered by commit time then path (ref snapshot
    * walk `formatters.py:156-173`). Each consecutive parent→child pair
    * contributes two anti-joins on metadata-small relations; the chain
    * walk itself is driver-side over already-loaded snapshot metadata. */
  def changes(spark: SparkSession, t: IcebergTable, fromSnap: Long, toSnap: Long): DataFrame = {
    // walk child←parent pointers from toSnap back to fromSnap (exclusive)
    var chain = List.empty[graft.meta.Snapshot]
    var cur: Option[graft.meta.Snapshot] = Some(t.metadata.snapshot(toSnap)
      .getOrElse(throw new NoSuchElementException(s"Snapshot $toSnap not found")))
    while (cur.exists(_.snapshotId != fromSnap)) {
      val s = cur.get
      chain = s :: chain
      cur = s.parentSnapshotId.map(pid => t.metadata.snapshot(pid).getOrElse(
        throw new NoSuchElementException(s"Parent snapshot $pid not found")))
      if (cur.isEmpty)
        throw new IllegalArgumentException(
          s"Snapshot $fromSnap is not an ancestor of $toSnap")
    }
    require(chain.nonEmpty, s"empty snapshot range ($fromSnap, $toSnap]")

    val perSnapshot = chain.map { s =>
      val curFiles = MetaRelations.files(spark, t, Some(s.snapshotId))
      val prevFiles = s.parentSnapshotId match {
        case Some(pid) => MetaRelations.files(spark, t, Some(pid))
        case None => spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          MetaRelations.filesSchema)
      }
      def side(a: DataFrame, b: DataFrame, label: String): DataFrame =
        a.join(broadcast(b.select("file_path")), Seq("file_path"), "left_anti")
          .select(
            lit(s.snapshotId).as("snapshot_id"),
            lit(s.timestampMs).as("timestamp_ms"),
            lit(s.operation).as("operation"),
            lit(label).as("change"),
            col("file_path"), col("partition"),
            col("record_count"), col("file_size_in_bytes"))
      side(curFiles, prevFiles, "added")
        .unionByName(side(prevFiles, curFiles, "deleted"))
    }
    perSnapshot.reduce(_ unionByName _)
      .orderBy("timestamp_ms", "snapshot_id", "change", "file_path")
  }
}
