package org.apache.spark.sql

import java.nio.file.{Files, Paths}
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal, Pmod, Subtract, Substring, UnsafeProjection}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.meta.TableWriter

/** EXECUTOR-SIDE parquet writing for graft's DSv2 row-level operations
  * (SQL `UPDATE` / `MERGE INTO` / complex `DELETE` — the group-based
  * copy-on-write `ReplaceData` plan). Spark's `ReplaceDataExec` demands a
  * real V2 [[BatchWrite]] (the V1 `InsertableRelation` bridge only covers
  * append/overwrite), so this is the genuinely distributed write: each
  * task writes rows straight into the table's `data/` directory through
  * Spark's own parquet `OutputWriter` (same codec/config as any DataFrame
  * write, via `ParquetUtils.prepareWrite`), fanning out one file per
  * partition value it encounters — the Iceberg fanout-writer shape. The
  * driver never sees a row: commit messages carry (path, partition map)
  * only, and [[TableWriter.commitFiles]] turns them into manifest entries
  * with one distributed stats pass.
  *
  * Lives in `org.apache.spark.sql` because `ParquetUtils`/`ParquetOptions`
  * and `SerializableConfiguration` are `private[sql]`/`private[spark]`.
  */
object GraftCowWriteBridge {

  /** One partition dimension: (partition-field name, transform,
    * source column name, iceberg type of the source). */
  type PartDim = (String, String, String, String)

  /** Build the COW batch write. `scannedPaths` is consulted at COMMIT
    * time (after the scan executed) for the group files being replaced;
    * `onCommit` lets the caller observe the result. */
  def batchWrite(
      spark: SparkSession,
      tableDir: String,
      tableSchema: StructType,
      writeSchema: StructType,
      partDims: Seq[PartDim],
      scannedPaths: () => Set[String],
      operation: String): BatchWrite = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    // the fanout writer inherits the SESSION conf via prepareWrite — pin
    // the footer-id write half for user-built sessions (the staged path
    // does the same in TableWriter.commit)
    graft.meta.FieldIds.ensureWriteEnabled(cs)
    val job = Job.getInstance(cs.sessionState.newHadoopConf())
    // field-id-attributed file schema: the COW rewrite files must carry
    // footer ids like every other engine write, or an id-stamped table's
    // post-UPDATE reads fail (the read path refuses id-less files rather
    // than silently nulling them)
    val fileSchema = graft.meta.FieldIds.attribute(
      tableSchema, graft.meta.IcebergMeta.load(tableDir).currentSchema)
    val factory = ParquetUtils.prepareWrite(
      cs.sessionState.conf, job, fileSchema,
      new ParquetOptions(Map.empty[String, String], cs.sessionState.conf))
    val tz = cs.sessionState.conf.sessionLocalTimeZone
    new GraftCowBatchWrite(
      tableDir, fileSchema, writeSchema, partDims, scannedPaths, operation,
      factory, new SerializableConfiguration(job.getConfiguration), tz)
  }

  /** The transform as a BOUND catalyst expression over `schema` — the
    * executor-side twin of [[graft.meta.Transforms.column]] (same
    * semantics; `Cast(_, string)` matches the staged write's
    * `.cast("string")` partition-value rendering). */
  private[sql] def partitionExpr(
      schema: StructType, transform: String, srcName: String,
      iceType: String): Expression = {
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncRe = """truncate\[(\d+)\]""".r
    val i = schema.fieldIndex(srcName)
    val ref = BoundReference(i, schema(i).dataType, schema(i).nullable)
    transform match {
      case "identity" => ref
      case BucketRe(n) => graft.expr.IcebergBucket(ref, n.toInt)
      case TruncRe(w) => iceType match {
        case "int" => Subtract(ref, Pmod(ref, Literal(w.toInt)))
        case "long" => Subtract(ref, Pmod(ref, Literal(w.toLong)))
        case "string" => Substring(ref, Literal(1), Literal(w.toInt))
        case other => throw new IllegalArgumentException(
          s"truncate[$w] unsupported for $other columns")
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported transform $other")
    }
  }
}

private final case class GraftCowCommitMessage(
    files: Seq[(String, Map[String, String])]) extends WriterCommitMessage

private final class GraftCowBatchWrite(
    tableDir: String,
    tableSchema: StructType,
    writeSchema: StructType,
    partDims: Seq[GraftCowWriteBridge.PartDim],
    scannedPaths: () => Set[String],
    operation: String,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    timeZoneId: String) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCowWriterFactory(
      tableDir, tableSchema, writeSchema, partDims, factory, conf, timeZoneId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq
      .collect { case m: GraftCowCommitMessage => m.files }.flatten
    val remove = scannedPaths()
    if (files.isEmpty && remove.isEmpty) return // nothing matched, no groups read
    TableWriter.commitFiles(
      SparkSession.active, tableDir, files, remove, "overwrite",
      extraSummary = Map("sql-command" -> operation))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case m: GraftCowCommitMessage => m.files }
      .flatten.foreach { case (rel, _) =>
        Files.deleteIfExists(Paths.get(tableDir).resolve(rel))
      }
}

private final class GraftCowWriterFactory(
    tableDir: String,
    tableSchema: StructType,
    writeSchema: StructType,
    partDims: Seq[GraftCowWriteBridge.PartDim],
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    timeZoneId: String) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCowDataWriter(
      tableDir, tableSchema, writeSchema, partDims, factory, conf,
      timeZoneId, partitionId, taskId)
}

/** Fanout writer: incoming rows (in the query's column order) are
  * reordered to the table schema, routed by their partition-transform
  * values, and appended to one open parquet writer per partition value.
  * File names are UUID-unique — commit/abort reconciles them. */
private final class GraftCowDataWriter(
    tableDir: String,
    tableSchema: StructType,
    writeSchema: StructType,
    partDims: Seq[GraftCowWriteBridge.PartDim],
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    timeZoneId: String,
    partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val context = new TaskAttemptContextImpl(
    conf.value,
    new TaskAttemptID(
      new TaskID(new JobID("graft-cow", 0), TaskType.MAP, partitionId),
      taskId.toInt & Int.MaxValue))

  /** `ReplaceData` plans deliver rows PREFIXED with an int
    * `__row_operation` column (RowDeltaUtils) when no metadata projection
    * is in play — Spark's plain writing task hands them over raw. The
    * offset is detected from the first row's arity; with the prefix
    * present, DELETE-marked rows are skipped (COW queries normally omit
    * them — this is defensive) and everything else is written. */
  private var opOffset = -1 // unknown until the first row

  private def reorderWithOffset(off: Int) = UnsafeProjection.create(
    tableSchema.fields.map { f =>
      val i = writeSchema.fieldIndex(f.name)
      BoundReference(off + i, writeSchema(i).dataType, writeSchema(i).nullable)
        : Expression
    }.toIndexedSeq)

  private var reorder: UnsafeProjection = null

  private val partProj =
    if (partDims.isEmpty) null
    else UnsafeProjection.create(
      partDims.map { case (_, transform, src, iceType) =>
        Cast(
          GraftCowWriteBridge.partitionExpr(tableSchema, transform, src, iceType),
          StringType, Some(timeZoneId)): Expression
      }.toIndexedSeq)

  // partition values -> (open writer, relative path)
  private val open = mutable.LinkedHashMap.empty[Seq[String], (OutputWriter, String)]

  override def write(row: InternalRow): Unit = {
    if (opOffset < 0) {
      opOffset = row.numFields - writeSchema.length
      require(opOffset == 0 || opOffset == 1,
        s"row arity ${row.numFields} does not match write schema " +
          s"${writeSchema.simpleString} (+ optional operation column)")
      reorder = reorderWithOffset(opOffset)
    }
    if (opOffset == 1 &&
        row.getInt(0) == org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION)
      return
    val r = reorder(row)
    val key: Seq[String] =
      if (partProj == null) Nil
      else {
        val pr = partProj(r)
        // null partition value → the same sentinel the staged path's
        // partitionBy directory produces (manifest strings are
        // non-nullable; a literal null NPEs the Avro writer at commit)
        partDims.indices.map(i =>
          if (pr.isNullAt(i)) graft.meta.Transforms.NullPartitionValue
          else pr.getUTF8String(i).toString)
      }
    open.getOrElseUpdate(key, {
      val rel = s"data/cow-$partitionId-$taskId-${UUID.randomUUID()}" +
        factory.getFileExtension(context)
      val abs = Paths.get(tableDir).resolve(rel)
      Files.createDirectories(abs.getParent)
      (factory.newInstance(abs.toString, tableSchema, context), rel)
    })._1.write(r)
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._1.close())
    GraftCowCommitMessage(open.map { case (key, (_, rel)) =>
      rel -> partDims.map(_._1).zip(key).toMap
    }.toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { case (w, rel) =>
      try w.close() catch { case _: Throwable => () }
      Files.deleteIfExists(Paths.get(tableDir).resolve(rel))
    }
  }

  override def close(): Unit = ()
}
