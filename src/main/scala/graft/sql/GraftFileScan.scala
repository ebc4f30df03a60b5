package graft.sql

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftParquetBridge
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

import graft.meta.{DataFileEntry, IcebergTable}

/** The catalog's data scan over a statically-pruned manifest file list,
  * upgraded with the two DSv2 capabilities that matter most on a big
  * cluster:
  *
  *   - [[SupportsReportStatistics]] — `numRows` and `sizeInBytes` are the
  *     EXACT sums over the surviving manifest entries (`record_count`,
  *     `file_size_in_bytes`), not a size-based guess. Catalyst's join
  *     planning sees real cardinalities, so a dimension-sized graft table
  *     broadcast-joins instead of shuffling 100 TB of fact rows.
  *   - [[SupportsRuntimeV2Filtering]] — dynamic partition pruning: when
  *     this table is joined on a column the manifests carry stats for,
  *     Spark feeds the join-key values observed at RUNTIME back into
  *     `filter(...)`, and the scan re-prunes its file list with the same
  *     conservative bounds/partition-transform logic as static pushdown
  *     ([[FilePrune.keep]]). A `sales JOIN dim ON sales.region = dim.r`
  *     with 3 surviving dim rows reads 3 partitions' files, not all of
  *     them — without any static predicate on the fact table.
  *
  * Row reading still delegates to Spark's own vectorized `ParquetScan`
  * ([[GraftParquetBridge.scan]]) over the surviving paths, so whole-stage
  * codegen and row-group pruning are native. The delegate is rebuilt on
  * each `toBatch` call because Spark plans partitions once before and
  * once after runtime filtering.
  *
  * Scale shape: pruning runs driver-side over the manifest entry list
  * (metadata-scale), the way Iceberg's scan planning does; every pruned
  * entry saves a full data-file read on the executors.
  */
final class GraftFileScan(
    t: IcebergTable,
    dataSchema: StructType,
    required: StructType,
    pushed: Seq[sources.Filter],
    initialEntries: Seq[DataFileEntry],
    runtimeFilterCols: Option[Seq[String]] = None)
  extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  @volatile private var entries: Seq[DataFileEntry] = initialEntries

  /** Exposed for specs/EXPLAIN audits: the currently surviving file list. */
  def currentEntries: Seq[DataFileEntry] = entries

  override def readSchema(): StructType = required

  /** Every projected column is a candidate runtime-filter attribute:
    * manifest bounds exist for all primitives, so bounds pruning (not
    * just partition identity) can act on whatever key the join uses.
    * Restricted to the pruned read schema — Spark resolves these against
    * the scan's OUTPUT attributes. Row-level operation scans narrow this
    * to the partition SOURCE columns (`runtimeFilterCols`): Spark's
    * runtime group filtering builds one distinct-subquery over ALL filter
    * attributes, and a full-row struct neither translates to a v1 filter
    * nor prunes — partition columns keep the subquery cheap and the
    * prune effective. */
  override def filterAttributes(): Array[NamedReference] =
    runtimeFilterCols.getOrElse(required.fieldNames.toSeq)
      .filter(c => required.fieldNames.contains(c))
      .map(Expressions.column).toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    val v1: Array[sources.Filter] = GraftParquetBridge.toV1Filters(predicates)
    if (v1.nonEmpty)
      entries = entries.filter(e => v1.forall(f => FilePrune.keep(t, e, f)))
  }

  override def toBatch: Batch =
    GraftParquetBridge.scan(
      SparkSession.active,
      entries.map(e => t.resolvePath(e.filePath)),
      dataSchema, required, pushed).toBatch

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(entries.map(_.fileSizeInBytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(entries.map(_.recordCount).sum)

    /** Per-column stats for CBO: `distinctCount` from the last ANALYZE
      * ([[graft.ops.Stats.analyzeTable]] properties), `nullCount` summed
      * from the surviving manifest entries. */
    override def columnStats(): java.util.Map[
        NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val ndv = graft.ops.Stats.storedNdv(t)
      val out = new java.util.HashMap[
        NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      t.metadata.currentSchema.fields
        .filter(f => !f.path.contains('.') && required.fieldNames.contains(f.name))
        .foreach { f =>
          val nulls: Option[Long] = {
            val per = entries.map(_.nullValueCounts.get(f.id))
            if (per.nonEmpty && per.forall(_.isDefined)) Some(per.flatten.sum)
            else None
          }
          val dc = ndv.get(f.name)
          if (dc.isDefined || nulls.isDefined)
            out.put(
              Expressions.column(f.name),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): OptionalLong =
                  dc.map(OptionalLong.of).getOrElse(OptionalLong.empty)
                override def nullCount(): OptionalLong =
                  nulls.map(OptionalLong.of).getOrElse(OptionalLong.empty)
              })
        }
      out
    }
  }

  override def description(): String =
    s"GraftFileScan(${t.tableDir}, files=${entries.size})"
}
