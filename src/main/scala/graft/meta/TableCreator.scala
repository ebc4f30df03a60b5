package graft.meta

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Bootstrap an EMPTY format-v2 table: directories plus a
  * `v1.metadata.json` with schema version 0, partition spec 0 and no
  * snapshots — the state every engine write ([[TableWriter]]) and
  * evolution commit ([[SchemaEvolution]]) builds on. The reference
  * creates tables through pyiceberg's `create_table`
  * (ref `demo.py:34-46`, `quickstart/seed.py:41-60`); this is the
  * engine-native equivalent, and the SQL surface's `CREATE TABLE`
  * ([[graft.sql.GraftCatalog]]) lands here. Metadata-only — no Spark
  * job runs until the first insert. */
object TableCreator {

  /** Spark column type → Iceberg primitive type name. The write surface
    * is flat schemas of primitives, `binary` (opaque multimodal
    * payloads) and `list<primitive>` (embedding vectors — see
    * [[create]], which allocates the list's element-id). */
  def iceType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "string"
    case DateType => "date"
    case TimestampType => "timestamp"
    case BooleanType => "boolean"
    case BinaryType => "binary"
    case other => throw new IllegalArgumentException(
      s"unsupported column type ${other.simpleString} " +
        "(the write surface is flat primitive/binary/list<primitive> schemas)")
  }

  /** Create the table at `tableDir`. `partitionDecls` use the
    * [[Transforms.parseDecl]] syntax: bare `col` (identity),
    * `bucket[N](col)`, `truncate[W](col)`. Fails if a table (a
    * `metadata/` dir) already exists there. */
  def create(
      tableDir: String,
      schema: StructType,
      partitionDecls: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty): Unit = {
    val dir = Paths.get(tableDir)
    require(!Files.isDirectory(dir.resolve("metadata")),
      s"table already exists at $tableDir")
    require(schema.fields.nonEmpty, "schema cannot be empty")
    // list element-ids are allocated AFTER every top-level id (Iceberg
    // field ids are schema-unique across nesting levels)
    var nextId = schema.fields.length
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case ArrayType(el, _) =>
          val prim = iceType(el)
          require(!prim.contains('<') && prim != "binary",
            s"list element of ${f.name} must be a primitive, got ${el.simpleString}")
          nextId += 1
          SchemaField(i + 1, f.name, required = false, s"list<$prim>", f.name,
            s"""{"type":"list","element-id":$nextId,"element":"$prim","element-required":false}""")
        case dt =>
          SchemaField(i + 1, f.name, required = false, iceType(dt), f.name)
      }
    }.toSeq
    val specFields = partitionDecls.map(Transforms.parseDecl).zipWithIndex.map {
      case ((src, transform), i) =>
        val sf = fields.find(_.name == src).getOrElse(
          throw new IllegalArgumentException(
            s"partition source $src is not a column of the schema"))
        require(!sf.fieldType.startsWith("list<") && sf.fieldType != "binary",
          s"cannot partition on non-primitive column $src (${sf.fieldType})")
        SpecField(Transforms.fieldName(src, transform), transform, sf.id, 1000 + i)
    }
    val md = TableMetadata(
      formatVersion = 2,
      tableUuid = java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      location = tableDir,
      lastUpdatedMs = System.currentTimeMillis(),
      currentSchemaId = 0,
      schemas = Seq(IceSchema(0, fields)),
      defaultSpecId = 0,
      partitionSpecs = Seq(PartitionSpec(0, specFields)),
      // stamp the field-id guarantee: every file this table can ever
      // contain comes from the engine's attributed write path, so scans
      // may resolve columns by parquet field id (rename-safe reads —
      // see [[FieldIds]]). Caller properties win on a key collision.
      properties = Map(FieldIds.PropKey -> "true") ++ properties,
      currentSnapshotId = None,
      snapshots = Seq.empty)
    Files.createDirectories(dir.resolve("metadata"))
    Files.createDirectories(dir.resolve("data"))
    // CAS publish: two racing CREATEs resolve to one winner + one
    // CommitConflictException, never a clobbered v1 document
    IcebergMeta.publish(dir.resolve("metadata").resolve("v1.metadata.json"),
      IcebergMeta.render(md))
  }
}
