package graft.sql

import org.apache.spark.sql.{GraftCowWriteBridge, SparkSession}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, RowLevelOperation, Write, WriteBuilder}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based COPY-ON-WRITE row-level operation — what Spark's analyzer
  * rewrites SQL `UPDATE` / `MERGE INTO` / non-metadata `DELETE` into
  * (`RewriteUpdateTable` / `RewriteMergeIntoTable` → `ReplaceData`):
  *
  *   1. the SCAN half reads the candidate files — the command's condition
  *      is pushed down statically (manifest bounds + partition-transform
  *      pruning, [[FilePrune]]) and Spark's runtime group filtering can
  *      prune further through [[GraftFileScan.filter]], so only files
  *      that may hold matching rows are rewritten;
  *   2. Spark computes the surviving rows (unmodified + updated/merged);
  *   3. the WRITE half streams them back through the executor-side
  *      parquet fanout writer ([[GraftCowWriteBridge]]) and commits a
  *      replace snapshot: scanned files out, rewritten files in, all
  *      other files carried forward — prior snapshots stay readable.
  *
  * The scan instance is recorded on this operation so the write's commit
  * knows EXACTLY which group files it replaces (the Iceberg
  * SparkCopyOnWriteScan/Write pairing).
  *
  * Delete-carrying (merge-on-read) tables are refused: a COW rewrite of
  * raw files would resurrect deleted rows. Compaction
  * ([[graft.ops.Compact]]) folds the deletes, after which SQL row-level
  * ops work; the engine API (`Engine.updateWhere` / `deleteWhere`)
  * covers MoR tables meanwhile. */
final class GraftRowLevelOperation(
    table: GraftTable, cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  @volatile private var lastScan: Option[GraftFileScan] = None

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (table.t.deleteFiles(None).nonEmpty)
      throw new UnsupportedOperationException(
        s"SQL $cmd on a delete-carrying table is unsupported: run compaction " +
          "to fold the deletes first (graft.ops.Compact); the engine API " +
          "(updateWhere/deleteWhere) handles merge-on-read tables directly")
    val partSources: Seq[String] = {
      val md = table.t.metadata
      md.currentSpec.fields.flatMap(sf =>
        md.currentSchema.fields.find(_.id == sf.sourceId).map(_.name))
    }.distinct
    new GraftScanBuilder(table.t, table.schema(), None, Some(partSources)) {
      override def build(): Scan = {
        val s = super.build().asInstanceOf[GraftFileScan]
        lastScan = Some(s)
        s
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val md = table.t.metadata
    val fields = md.currentSchema.fields
    val partDims: Seq[GraftCowWriteBridge.PartDim] =
      md.currentSpec.fields.map { sf =>
        val src = fields.find(_.id == sf.sourceId).getOrElse(
          throw new IllegalStateException(
            s"partition source field ${sf.sourceId} missing from current schema"))
        (sf.name, sf.transform, src.name, src.fieldType)
      }
    new WriteBuilder {
      override def build(): Write =
        new Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def toBatch: BatchWrite = GraftCowWriteBridge.batchWrite(
          SparkSession.active, table.tableDir, table.schema(), info.schema(),
          partDims,
          () => lastScan.map(_.currentEntries.map(_.filePath).toSet)
            .getOrElse(Set.empty),
          cmd.toString)

        /** Cluster the rewrite by the partition transforms (the Iceberg
          * hash distribution mode): each partition value lands in one
          * task, so the fanout writer emits one file per value instead of
          * one per (task, value) — no small-file shower at scale. Not
          * strictly required: tiny rewrites may skip the shuffle. */
        override def requiredDistribution()
          : org.apache.spark.sql.connector.distributions.Distribution = {
          val BucketRe = """bucket\[(\d+)\]""".r
          val TruncRe = """truncate\[(\d+)\]""".r
          val exprs = partDims.map {
            case (_, BucketRe(n), src, _) =>
              org.apache.spark.sql.connector.expressions.Expressions
                .bucket(n.toInt, src)
                : org.apache.spark.sql.connector.expressions.Expression
            case (_, TruncRe(_), src, _) =>
              // truncate has no resolvable v2 function here: cluster on
              // the source column (a refinement — still co-locates values)
              org.apache.spark.sql.connector.expressions.Expressions.column(src)
            case (_, _, src, _) =>
              org.apache.spark.sql.connector.expressions.Expressions.identity(src)
          }
          if (exprs.isEmpty)
            org.apache.spark.sql.connector.distributions.Distributions.unspecified()
          else
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(exprs.toArray)
        }
        override def distributionStrictlyRequired(): Boolean = false
        override def requiredOrdering()
          : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
      }
    }
  }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, ${table.tableDir})"
}
