package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, Metadata, MetadataBuilder, StructField, StructType}

/** Iceberg FIELD-ID column resolution for parquet data files.
  *
  * The Iceberg spec requires readers to resolve data-file columns by
  * field id, never by name — that is what makes `rename` a metadata-only
  * operation (old files keep the old parquet column NAME but the same
  * field ID, and a post-rename scan must still surface their data under
  * the new name). Spark supports exactly this through the
  * `parquet.field.id` StructField metadata key:
  *
  *   - writes: with `spark.sql.parquet.fieldId.write.enabled` (default
  *     true), an attributed write schema lands `PARQUET:field_id` in the
  *     file footers;
  *   - reads: with `spark.sql.parquet.fieldId.read.enabled` set, an
  *     attributed READ schema is matched against those footer ids —
  *     id-less read schemas keep plain name matching, so enabling the
  *     conf is safe session-wide.
  *
  * The one hazard is an attributed read schema against an id-LESS file:
  * Spark then errors (or nulls every column under `ignoreMissing`) —
  * there is NO name fallback. So id-resolved reads are gated on the
  * [[PropKey]] table property, stamped by [[TableCreator]] at create
  * time: a table carries it iff every data/delete file it can contain
  * was written by this engine's attributed write path. Pre-existing
  * tables (no property) keep the historical name-resolved read.
  */
object FieldIds {

  /** Table property marking every file as carrying parquet field ids. */
  val PropKey = "graft.parquet.field-ids"

  /** For MIGRATED legacy tables: the commit sequence number from which
    * the guarantee holds ([[graft.api.Engine.migrateToFieldIds]] rewrites
    * the live rows through the attributed writer and stamps this).
    * Snapshots with a SMALLER sequence hold pre-migration id-less files
    * and keep the historical name-resolved read; absent = id-stamped
    * from birth. */
  val SinceSeqKey = "graft.parquet.field-ids.since-seq"

  /** Iceberg reserved field ids for position-delete files (spec §Delete
    * Formats: 2147483546 = file_path, 2147483545 = pos). */
  val PosDeletePathId = 2147483546
  val PosDeletePosId  = 2147483545

  def tableHasIds(md: TableMetadata): Boolean =
    md.properties.get(PropKey).contains("true")

  def sinceSeq(md: TableMetadata): Option[Long] =
    md.properties.get(SinceSeqKey).flatMap(_.toLongOption)

  /** Are the files of a commit at `seq` guaranteed id-stamped? */
  def idsAtSeq(md: TableMetadata, seq: Long): Boolean =
    tableHasIds(md) && sinceSeq(md).forall(seq >= _)

  /** Are the files of `snapshotId`'s state (current when None) guaranteed
    * id-stamped? After a migration the full-rewrite boundary makes every
    * snapshot at/after the stamped sequence all-post-migration files.
    * An UNKNOWN explicit snapshot id (expired-but-referenced) answers
    * `false` — the conservative name-resolved read — rather than
    * silently deciding attribution from the CURRENT snapshot's sequence,
    * which may sit on the other side of the boundary. */
  def idsAtSnapshot(md: TableMetadata, snapshotId: Option[Long]): Boolean =
    tableHasIds(md) && (sinceSeq(md) match {
      case None => true
      case Some(since) => snapshotId match {
        case None => md.currentSnapshot.forall(_.sequenceNumber >= since)
        case Some(id) => md.snapshot(id).exists(_.sequenceNumber >= since)
      }
    })

  def idMetadata(id: Int): Metadata =
    new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()

  private def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong("parquet.field.id", id.toLong).build())

  /** Attach field-id metadata to a Spark schema from the table's
    * Iceberg schema, RECURSIVELY: every struct field at every nesting
    * level gets its id from the flattened dotted-path tree
    * (`parent.child` members, `parent.element` / `parent.key|value`
    * wrappers), so a FOREIGN id-stamped table's nested renames are as
    * read-safe as top-level ones. List elements and map entries carry
    * no Spark `StructField` to hold metadata — Spark's parquet reader
    * matches those structurally, which is also what the Iceberg spec
    * implies (the wrapper ids exist for evolution bookkeeping; the
    * repeated group has no name to drift). The engine's own writable
    * surface stays flat, where this reduces to the top-level mapping. */
  def attribute(st: StructType, ice: IceSchema): StructType = {
    val idByPath = ice.fields.map(f => f.path -> f.id).toMap
    def attr(dt: DataType, prefix: String): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val recursed = f.copy(dataType = attr(f.dataType, p))
        idByPath.get(p).map(withId(recursed, _)).getOrElse(recursed)
      })
      case a: ArrayType => a.copy(elementType = attr(a.elementType, s"$prefix.element"))
      case m: MapType => m.copy(keyType = attr(m.keyType, s"$prefix.key"),
        valueType = attr(m.valueType, s"$prefix.value"))
      case other => other
    }
    attr(st, "").asInstanceOf[StructType]
  }

  /** Re-select `df`'s columns with field-id metadata so the parquet
    * writer stamps footer ids (write conf is default-on in Spark 4). */
  def attributeColumns(df: DataFrame, fields: Seq[SchemaField]): DataFrame = {
    val idByName = fields.map(f => f.name -> f.id).toMap
    df.select(df.columns.toIndexedSeq.map { n =>
      idByName.get(n) match {
        case Some(id) => col(n).as(n, idMetadata(id))
        case None => col(n)
      }
    }: _*)
  }

  /** Same, for an explicit (name, id) list (delete-file schemas). */
  def attributeExplicit(df: DataFrame, ids: Seq[(String, Int)]): DataFrame = {
    val idByName = ids.toMap
    df.select(df.columns.toIndexedSeq.map { n =>
      idByName.get(n) match {
        case Some(id) => col(n).as(n, idMetadata(id))
        case None => col(n)
      }
    }: _*)
  }

  /** Id-resolved reads need the session conf ON (runtime-settable; a
    * no-op when already set). Called at each id-attributed read site so
    * the engine works under user-built sessions, not just [[graft.Sessions]]. */
  def ensureReadEnabled(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

  /** The write-side twin: the id guarantee DEPENDS on attributed write
    * schemas landing footer ids, and that conf is a Spark default that
    * could flip. Called at each engine write entry point (not just the
    * [[graft.Sessions]] factory) so user-built sessions write id-stamped
    * files too. Runtime-settable; a no-op when already set. */
  def ensureWriteEnabled(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
}
