package graft.sql

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.api.Engine

/** Maintenance as SQL STORED PROCEDURES (Spark 4 DSv2 `ProcedureCatalog`)
  * — the Iceberg `CALL catalog.system.<proc>(...)` surface:
  *
  * {{{
  * CALL graft.system.compact(`table` => 'lake.orders')
  * CALL graft.system.expire_snapshots('lake.orders', 1700000000000, 2)
  * CALL graft.system.rewrite_manifests('lake.orders')
  * CALL graft.system.rollback('lake.orders', 1003)
  * CALL graft.system.analyze('lake.orders')
  * }}}
  *
  * Each procedure runs the corresponding engine operation (the expensive
  * ones — compact, analyze — are distributed Spark jobs; the rest are
  * metadata-scale) and returns a one-row result describing what
  * happened. */
object GraftProcedures {

  private def p(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** name -> (parameters, body(engine, args) -> result message). */
  private val procs: Map[String, (Array[ProcedureParameter], (Engine, InternalRow) => String)] = Map(
    "compact" -> (Array(p("table", StringType)),
      (e, in) => e.rewriteSmallFiles(in.getUTF8String(0).toString) match {
        case Some(r) => s"compacted into snapshot ${r.snapshotId}: ${r.addedFiles} files"
        case None => "nothing to compact"
      }),
    "expire_snapshots" -> (Array(
      p("table", StringType), p("older_than_ms", LongType),
      pd("retain_last", IntegerType, "1")),
      (e, in) => {
        val r = e.expireSnapshots(in.getUTF8String(0).toString, in.getLong(1), in.getInt(2))
        s"expired ${r.expiredSnapshots.size} snapshots; deleted " +
          s"${r.deletedManifests} manifests, ${r.deletedDataFiles} data files"
      }),
    "rewrite_manifests" -> (Array(
      p("table", StringType), pd("target_entries", IntegerType, "5000")),
      (e, in) => e.rewriteManifests(in.getUTF8String(0).toString, in.getInt(1)) match {
        case Some(r) =>
          s"packed ${r.manifestsBefore} manifests into ${r.manifestsAfter}"
        case None => "manifests already packed"
      }),
    "rollback" -> (Array(p("table", StringType), p("snapshot_id", LongType)),
      (e, in) => {
        val v = e.rollback(in.getUTF8String(0).toString, in.getLong(1))
        s"rolled back to snapshot ${in.getLong(1)} (metadata v$v)"
      }),
    "cherrypick_snapshot" -> (Array(p("table", StringType), p("snapshot_id", LongType)),
      (e, in) => {
        val r = e.cherrypick(in.getUTF8String(0).toString, in.getLong(1))
        if (r.fastForward)
          s"fast-forwarded to staged snapshot ${r.publishedSnapshotId}"
        else
          s"re-applied snapshot ${r.sourceSnapshotId} as ${r.publishedSnapshotId}"
      }),
    "analyze" -> (Array(p("table", StringType), pd("k", IntegerType, "1024")),
      (e, in) => {
        val t = in.getUTF8String(0).toString
        val r = graft.ops.Stats.analyzeTable(
          e.spark, e.tableDir(t), in.getInt(1))
        s"analyzed ${r.ndv.size} columns at snapshot ${r.snapshotId}"
      }),
    "remove_orphans" -> (Array(p("table", StringType)),
      (e, in) => s"removed ${e.removeOrphans(in.getUTF8String(0).toString)} orphan files"),
    "prune_dangling_deletes" -> (Array(p("table", StringType)),
      (e, in) => e.pruneDanglingDeletes(in.getUTF8String(0).toString) match {
        case Some(n) => s"pruned $n dangling delete files"
        case None => "no dangling delete files"
      }),
    "vacuum" -> (Array(
      p("table", StringType), p("older_than_ms", LongType),
      pd("retain_last", IntegerType, "1")),
      (e, in) => {
        val (pruned, ex, orphans) = e.vacuum(
          in.getUTF8String(0).toString, in.getLong(1), in.getInt(2))
        s"vacuum: pruned $pruned dangling deletes, expired " +
          s"${ex.expiredSnapshots.size} snapshots, removed $orphans orphans"
      }),
    "zorder" -> (Array(
      p("table", StringType), p("columns", StringType)),
      (e, in) => {
        val cols = in.getUTF8String(1).toString.split(",").toSeq.map(_.trim)
        e.rewriteClustered(in.getUTF8String(0).toString, cols) match {
          case Some(r) => s"z-order rewrite on (${cols.mkString(", ")}): " +
            s"snapshot ${r.snapshotId}, ${r.addedFiles} files"
          case None => "nothing to rewrite"
        }
      }),
    "create_tag" -> (Array(p("table", StringType), p("name", StringType)),
      (e, in) => {
        e.createTag(in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        s"tagged current snapshot as '${in.getUTF8String(1)}'"
      }),
    // Iceberg's register_table / add_files analogs: adopt plain parquet
    // in place (no data rewrite — see Engine.registerParquet/adoptFiles)
    "register_table" -> (Array(p("table", StringType), p("source_dir", StringType)),
      (e, in) => {
        val r = e.registerParquet(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        s"registered ${r.addedFiles} files / ${r.addedRecords} rows in " +
          s"place (snapshot ${r.snapshotId}); run migrate_field_ids for " +
          "rename-safe reads"
      }),
    "add_files" -> (Array(p("table", StringType), p("source_dir", StringType)),
      (e, in) => {
        val r = e.adoptFiles(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        s"adopted ${r.addedFiles} files / ${r.addedRecords} rows " +
          s"(snapshot ${r.snapshotId})"
      }),
    "migrate_field_ids" -> (Array(p("table", StringType)),
      (e, in) => e.migrateToFieldIds(in.getUTF8String(0).toString) match {
        case Some(snap) => s"rewrote with parquet field ids (snapshot " +
          s"$snap); renames are now read-safe"
        case None => "no data files; stamped the field-id guarantee"
      }),
    // Iceberg's create_changelog_view: register the row-level CDC of
    // (from, to] as a temp view for plain-SQL consumption. The view's
    // plan is the metadata-accelerated ChangeFeed read (only changed
    // files are scanned), evaluated lazily at view query time.
    "create_changelog_view" -> (Array(
      p("table", StringType), p("from_snapshot", LongType),
      p("to_snapshot", LongType), pd("view_name", StringType, "''"),
      pd("net_changes", org.apache.spark.sql.types.BooleanType, "false")),
      (e, in) => {
        val table = in.getUTF8String(0).toString
        val from = in.getLong(1)
        val to = in.getLong(2)
        val named = in.getUTF8String(3).toString
        val net = in.getBoolean(4)
        val view =
          if (named.nonEmpty) named
          else table.replace('.', '_') + "_changes"
        e.rowChanges(table, from, to, net).createOrReplaceTempView(view)
        s"changelog view '$view' over ($from, $to]" +
          (if (net) " (net changes)" else "")
      }))

  def names: Seq[String] = procs.keys.toSeq.sorted

  def load(procName: String, warehouse: String): UnboundProcedure = {
    val (params, body) = procs.getOrElse(procName,
      throw new UnsupportedOperationException(
        s"unknown procedure $procName (known: ${names.mkString(", ")})"))
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance procedure $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft maintenance procedure $procName"
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val engine = new Engine(SparkSession.active, warehouse)
          val msg = body(engine, input)
          val schema = new StructType().add("result", StringType)
          Collections.singletonList[Scan](new LocalScan {
            override def rows(): Array[InternalRow] =
              Array(new GenericInternalRow(
                Array[Any](UTF8String.fromString(msg))))
            override def readSchema(): StructType = schema
          }).iterator()
        }
      }
    }
  }
}
