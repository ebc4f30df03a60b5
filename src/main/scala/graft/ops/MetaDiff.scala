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
}
