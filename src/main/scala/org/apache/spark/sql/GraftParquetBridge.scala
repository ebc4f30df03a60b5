package org.apache.spark.sql

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge into Spark's `private[sql]` parquet DSv2 internals so graft's
  * catalog ([[graft.sql.GraftCatalog]]) can hand a metadata-pruned file
  * list to Spark's OWN vectorized parquet scan — the same delegation
  * shape the Iceberg Spark connector uses, minus a bespoke reader:
  * whole-stage codegen, row-group pruning on `pushedFilters`, and
  * `SupportsReportStatistics` (for broadcast-join planning) all come from
  * `ParquetScan` itself. */
/** A file partition that KNOWS its partition-key tuple — the
  * `HasPartitionKey` contract `KeyGroupedPartitioning` planning groups
  * by. Extends Spark's own `FilePartition` so the stock parquet reader
  * factory consumes it unchanged. */
private[sql] class GraftKeyedFilePartition(
    index: Int,
    files: Array[org.apache.spark.sql.execution.datasources.PartitionedFile],
    key: org.apache.spark.sql.catalyst.InternalRow)
  extends org.apache.spark.sql.execution.datasources.FilePartition(index, files)
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
}

object GraftParquetBridge {

  /** Is storage-partitioned-join planning enabled
    * (`spark.sql.sources.v2.bucketing.enabled`)? `SQLConf` is
    * `private[sql]`. */
  def v2BucketingEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.v2BucketingEnabled

  /** A [[org.apache.spark.sql.connector.read.Batch]] with ONE input
    * partition per PARTITION VALUE (each carrying its key via
    * `HasPartitionKey`) — what `KeyGroupedPartitioning` requires for
    * storage-partitioned joins: two graft tables laid out on the same
    * identity partitioning join with NO shuffle on either side. Rows are
    * still read by Spark's own vectorized parquet reader factory; only
    * the split planning changes (per-key grouping instead of size
    * balancing — the Iceberg SPJ trade). */
  def keyGroupedBatch(
      spark: SparkSession,
      groups: Seq[(org.apache.spark.sql.catalyst.InternalRow, Seq[String])],
      dataSchema: StructType,
      readSchema: StructType,
      pushed: Seq[Filter]): org.apache.spark.sql.connector.read.Batch = {
    import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
    import org.apache.spark.sql.execution.datasources.FilePartition
    // ONE delegate over the full file list (one file index, one split
    // computation — planning stays O(files) even with many partition
    // values), then its splits are regrouped by partition key
    def canon(p: String): String =
      "/" + new Path(p).toUri.getPath.dropWhile(_ == '/')
    val groupOf: Map[String, Int] = groups.zipWithIndex.flatMap {
      case ((_, paths), i) => paths.map(p => canon(p) -> i)
    }.toMap
    val delegate = scan(spark, groups.flatMap(_._2), dataSchema, readSchema, pushed)
      .toBatch
    val splitsByGroup = delegate.planInputPartitions()
      .flatMap(_.asInstanceOf[FilePartition].files)
      .groupBy(f => groupOf.getOrElse(canon(f.filePath.toString),
        throw new IllegalStateException(s"split for unknown file ${f.filePath}")))
    val parts: Array[InputPartition] = groups.zipWithIndex.flatMap {
      case ((key, _), i) => splitsByGroup.get(i).map(files =>
        new GraftKeyedFilePartition(i, files, key): InputPartition)
    }.toArray
    new Batch {
      override def planInputPartitions(): Array[InputPartition] = parts
      override def createReaderFactory(): PartitionReaderFactory =
        delegate.createReaderFactory()
    }
  }

  /** A v2 literal expression (`LiteralValue` is `private[sql]`); `value`
    * must be in Catalyst internal form (e.g. `UTF8String` for strings) —
    * the same form Spark's own runtime filters carry. */
  def v2Literal(
      value: Any, dt: org.apache.spark.sql.types.DataType)
    : org.apache.spark.sql.connector.expressions.Expression =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dt)

  /** DSv2 runtime-filter `Predicate`s → v1 `Filter`s (the shape
    * [[graft.sql.FilePrune]] prunes with); untranslatable predicates are
    * dropped — safe, pruning is conservative. `PredicateUtils` is
    * `private[sql]`, hence this bridge. */
  def toV1Filters(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
    : Array[Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** A vectorized parquet [[Scan]] over an explicit (already pruned) file
    * list. `dataSchema` is the table's current schema — files written
    * under older schema versions surface later-added columns as nulls;
    * `readSchema` is the column-pruned projection; `pushed` reaches the
    * parquet row-group/page index filters. */
  def scan(
      spark: SparkSession,
      paths: Seq[String],
      dataSchema: StructType,
      readSchema: StructType,
      pushed: Seq[Filter]): Scan = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val index = new InMemoryFileIndex(
      cs, paths.map(new Path(_)), Map.empty[String, String], Some(dataSchema))
    ParquetScan(
      cs,
      cs.sessionState.newHadoopConf(),
      index,
      dataSchema,
      readSchema,
      new StructType(), // no hive-style directory partitioning: Iceberg
                        // partition values live IN the data files
      pushed.toArray,
      CaseInsensitiveStringMap.empty())
  }
}
