package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{GraftParquetBridge, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{FsCatalog, IcebergTable}
import graft.ops.ScanPlanner

/** DSv2 CATALOG plugin: the whole graft warehouse addressable from plain
  * `spark.sql` — `SELECT * FROM graft.sales.orders` — with no
  * pre-created views. Registration:
  * {{{
  * spark.sql.catalog.graft           = graft.sql.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /path/to/warehouse
  * }}}
  *
  * Scale shape: `loadTable` reads only the table's metadata json (driver,
  * metadata-scale); each scan prunes the snapshot's file list with the
  * PUSHED filters (partition transforms + column bounds — the Iceberg
  * planning step, [[FilePrune]]) and then delegates to Spark's own
  * vectorized `ParquetScan` over the survivors
  * ([[org.apache.spark.sql.GraftParquetBridge]]), so whole-stage codegen,
  * row-group pruning and scan statistics (broadcast planning) are native.
  * All pushed filters are ALSO returned as residuals, so Spark
  * re-evaluates them row-level — pruning only has to be conservative,
  * never exact. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _
  private def fs = new FsCatalog(warehouse)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs option 'warehouse' (spark.sql.catalog.$name.warehouse)"))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.mkString(".")
    fs.listTables().filter(_._1 == ns)
      .map { case (n, t) => Identifier.of(Array(n), t) }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = s"$warehouse/${ident.namespace().mkString("/")}/${ident.name()}"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir, "metadata")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name())
    new GraftTable(dir)
  }

  /** SQL time travel `VERSION AS OF v`: `v` is a snapshot id or a ref
    * (tag/branch) name from the table's `refs` metadata. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val base = loadTable(ident).asInstanceOf[GraftTable]
    val md = base.t.metadata
    val snapId = md.refs.get(version).map(_.snapshotId)
      .orElse(version.toLongOption)
      .filter(id => md.snapshots.exists(_.snapshotId == id))
      .getOrElse(throw new IllegalArgumentException(
        s"VERSION AS OF '$version': no snapshot id or ref with that name"))
    new GraftTable(base.tableDir, Some(snapId))
  }

  /** SQL time travel `TIMESTAMP AS OF t` (micros since epoch): the
    * latest snapshot committed at or before `t`. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val base = loadTable(ident).asInstanceOf[GraftTable]
    val atOrBefore = base.t.metadata.snapshots
      .filter(_.timestampMs <= timestamp / 1000L)
    if (atOrBefore.isEmpty)
      throw new IllegalArgumentException(
        s"TIMESTAMP AS OF ${timestamp}us predates every snapshot")
    new GraftTable(base.tableDir, Some(atOrBefore.maxBy(_.timestampMs).snapshotId))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only over SQL; create tables via the engine write API")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only over SQL; evolve schemas via meta.SchemaEvolution")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only over SQL")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only over SQL")

  // ---- namespaces

  override def listNamespaces(): Array[Array[String]] =
    fs.listNamespaces().map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fs.listNamespaces().contains(namespace(0))

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only over SQL")

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only over SQL")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only over SQL")
}

/** One graft/Iceberg table surfaced to Catalyst. Reports its partition
  * transforms (identity / bucket / truncate) so EXPLAIN and future
  * storage-partitioned-join planning see the layout. Tables carrying
  * row-level DELETE files refuse the bare-scan path — a plain file scan
  * would resurrect deleted rows; those tables read correctly through
  * [[graft.ops.ScanPlanner.readTable]] / `Engine.createView`. */
final class GraftTable(val tableDir: String, snapshotId: Option[Long] = None)
  extends Table with SupportsRead {

  private[sql] val t: IcebergTable = IcebergTable.load(tableDir)

  override def name(): String =
    tableDir + snapshotId.map(id => s"@$id").getOrElse("")

  override def schema(): StructType =
    ScanPlanner.currentSparkSchema(t).getOrElse(
      throw new UnsupportedOperationException(
        s"table $tableDir has a nested/non-primitive schema; read it via " +
          "ScanPlanner.readTable (parquet inference) instead of the SQL catalog"))

  override def partitioning(): Array[Transform] =
    t.metadata.currentSpec.fields.flatMap { sf =>
      val src = t.metadata.currentSchema.fields.find(_.id == sf.sourceId)
      src.flatMap { f =>
        val BucketRe = """bucket\[(\d+)\]""".r
        val TruncRe = """truncate\[(\d+)\]""".r
        sf.transform match {
          case "identity" => Some(Expressions.identity(f.name))
          case BucketRe(n) => Some(Expressions.bucket(n.toInt, f.name))
          case TruncRe(_) => Some(Expressions.identity(sf.name))
          case _ => None
        }
      }
    }.toArray

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(t.deleteFiles(snapshotId).isEmpty,
      s"table $tableDir carries row-level delete files; SQL-catalog scans " +
        "would resurrect deleted rows — read it via ScanPlanner.readTable " +
        "or Engine.createView (merge-on-read)")
    new GraftScanBuilder(t, schema(), snapshotId)
  }
}

/** Pushdown-aware scan builder: remembers pushed filters for metadata
  * FILE pruning, hands them to the parquet scan for ROW-GROUP pruning,
  * and returns them all as residuals (Spark re-evaluates row-level). */
final class GraftScanBuilder(
    t: IcebergTable, dataSchema: StructType, snapshotId: Option[Long] = None)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = dataSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(FilePrune.translatable)
    filters // everything stays a residual — pruning is conservative
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val live = t.files(snapshotId)
    val kept = live.filter(e => pushed.forall(f => FilePrune.keep(t, e, f)))
    val paths = kept.map(e => t.resolvePath(e.filePath))
    GraftParquetBridge.scan(
      SparkSession.active, paths, dataSchema, required, pushed.toSeq)
  }
}
