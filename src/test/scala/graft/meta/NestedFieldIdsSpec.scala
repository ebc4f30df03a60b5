package graft.meta

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.api.Engine

/** FIELD-ID resolution for NESTED schemas of FOREIGN tables. The
  * engine's own write surface is flat, but an id-stamped Iceberg table
  * written elsewhere can carry struct/list/map columns — its reads must
  * (a) use the DECLARED schema (not parquet inference) and (b) resolve
  * nested struct members by field id, so a foreign nested rename is as
  * read-safe as a top-level one (ref `formatters.py:127-139` renders
  * nested schemas recursively; this is the read-side contract behind
  * that display). */
class NestedFieldIdsSpec extends SparkSpec {
  import spark.implicits._

  private def idMeta(id: Int): Metadata =
    new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()

  /** One parquet file with footer field ids at every level. `bFooterId`
    * lets the adoption test stamp a DIVERGENT nested id. */
  private def writeNestedFile(dir: java.nio.file.Path, relPath: String,
      rows: Seq[Row] = Seq(
        Row(1L, Row(10L, "x"), Seq("t1", "t2")),
        Row(2L, Row(20L, "y"), Seq.empty[String])),
      bFooterId: Int = 4): Long = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false, idMeta(1)),
      StructField("s", StructType(Seq(
        StructField("a", LongType, nullable = true, idMeta(3)),
        StructField("b", StringType, nullable = true, idMeta(bFooterId)))),
        nullable = true, idMeta(2)),
      StructField("tags", ArrayType(StringType, containsNull = true),
        nullable = true, idMeta(5))))
    val tmp = Files.createTempDirectory("graft-nested-stage")
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val target = dir.resolve(relPath)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    Files.size(target)
  }

  private def structJson(bName: String): String =
    s"""{"type":"struct","fields":[
       |{"id":3,"name":"a","required":false,"type":"long"},
       |{"id":4,"name":"$bName","required":false,"type":"string"}]}"""
      .stripMargin.replace("\n", "")
  private val tagsJson =
    """{"type":"list","element-id":6,"element":"string","element-required":false}"""

  private def schemaFields(bName: String): Seq[SchemaField] = Seq(
    SchemaField(1, "id", required = true, "long", "id"),
    SchemaField(2, "s", required = false, s"struct<a: long, $bName: string>",
      "s", structJson(bName)),
    SchemaField(5, "tags", required = false, "list<string>", "tags", tagsJson))

  test("foreign nested id-stamped table: declared schema read; a nested " +
      "member rename keeps serving old files' data by field id") {
    val wh = Files.createTempDirectory("graft-nested-wh").toString
    val tableDir = s"$wh/ext/nested"
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("data"))
    Files.createDirectories(dir.resolve("metadata"))
    val size = writeNestedFile(dir, "data/nested-000.parquet")

    val snapId = 7000L
    val entry = DataFileEntry(
      status = 1, snapshotId = snapId, content = 0,
      filePath = "data/nested-000.parquet", fileFormat = "PARQUET",
      partition = Map.empty, recordCount = 2L, fileSizeInBytes = size,
      columnSizes = Map.empty, valueCounts = Map.empty,
      nullValueCounts = Map.empty, lowerBounds = Map.empty,
      upperBounds = Map.empty, sequenceNumber = 1L)
    val manifestPath = s"metadata/manifest-$snapId.avro"
    AvroManifests.writeManifest(dir.resolve(manifestPath).toString, Seq(entry))
    val manifest = ManifestFile(
      manifestPath, Files.size(dir.resolve(manifestPath)), 0,
      content = 0, snapId, 1, 0, 0, 2L, 0, 0)
    val listPath = s"metadata/snap-$snapId.avro"
    AvroManifests.writeManifestList(dir.resolve(listPath).toString, Seq(manifest))

    val snap = Snapshot(snapId, None, 1700000000000L, "append",
      Map("operation" -> "append"), listPath,
      sequenceNumber = 1L, schemaId = Some(0))
    val md = TableMetadata(2,
      java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      tableDir, 1700000000000L, 0,
      Seq(IceSchema(0, schemaFields("b"))),
      0, Seq(PartitionSpec(0, Seq.empty)),
      Map(FieldIds.PropKey -> "true"),
      Some(snapId), Seq(snap))
    Files.writeString(dir.resolve("metadata/v1.metadata.json"),
      IcebergMeta.render(md))

    val e = new Engine(spark, wh)
    // the DECLARED nested schema, not parquet inference
    val df = e.readTable("ext.nested")
    assert(df.schema.fieldNames.toSeq == Seq("id", "s", "tags"))
    assert(df.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("a", "b"))
    val got = df.select(col("id"), col("s.a"), col("s.b"), col("tags"))
      .as[(Long, Long, String, Seq[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, "x", Seq("t1", "t2")), (2L, 20L, "y", Seq.empty)))

    // a FOREIGN nested rename: schema 1 renames member b → bb (same id
    // 4), current-schema-id moves — metadata-only, no file rewritten
    val md2 = md.copy(
      currentSchemaId = 1,
      schemas = md.schemas :+ IceSchema(1, schemaFields("bb")))
    Files.writeString(dir.resolve("metadata/v2.metadata.json"),
      IcebergMeta.render(md2))

    val df2 = new Engine(spark, wh).readTable("ext.nested")
    assert(df2.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("a", "bb"))
    val got2 = df2.select(col("id"), col("s.a"), col("s.bb"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1L, 10L, "x"), (2L, 20L, "y")),
      "the pre-rename file's nested member must read by field id, " +
        s"got $got2")
  }

  test("adoptFiles into a FOREIGN nested id-stamped table: nested footer " +
      "ids verified per dotted path, rename-safe read-back; a drop with " +
      "a divergent nested id is refused") {
    val wh = Files.createTempDirectory("graft-nested-adopt-wh").toString
    val tableDir = s"$wh/ext/adoptive"
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("data"))
    Files.createDirectories(dir.resolve("metadata"))
    val size = writeNestedFile(dir, "data/nested-000.parquet")

    val snapId = 7200L
    val entry = DataFileEntry(
      status = 1, snapshotId = snapId, content = 0,
      filePath = "data/nested-000.parquet", fileFormat = "PARQUET",
      partition = Map.empty, recordCount = 2L, fileSizeInBytes = size,
      columnSizes = Map.empty, valueCounts = Map.empty,
      nullValueCounts = Map.empty, lowerBounds = Map.empty,
      upperBounds = Map.empty, sequenceNumber = 1L)
    val manifestPath = s"metadata/manifest-$snapId.avro"
    AvroManifests.writeManifest(dir.resolve(manifestPath).toString, Seq(entry))
    val manifest = ManifestFile(
      manifestPath, Files.size(dir.resolve(manifestPath)), 0,
      content = 0, snapId, 1, 0, 0, 2L, 0, 0)
    val listPath = s"metadata/snap-$snapId.avro"
    AvroManifests.writeManifestList(dir.resolve(listPath).toString, Seq(manifest))
    val md = TableMetadata(2,
      java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      tableDir, 1700000000000L, 0,
      Seq(IceSchema(0, schemaFields("b"))),
      0, Seq(PartitionSpec(0, Seq.empty)),
      Map(FieldIds.PropKey -> "true"),
      Some(snapId),
      Seq(Snapshot(snapId, None, 1700000000000L, "append",
        Map("operation" -> "append"), listPath,
        sequenceNumber = 1L, schemaId = Some(0))))
    Files.writeString(dir.resolve("metadata/v1.metadata.json"),
      IcebergMeta.render(md))

    val e = new Engine(spark, wh)
    // a drop whose footers carry the schema's EXACT nested ids adopts —
    // round 16 refused any nested id-stamped table outright
    val drop = Files.createTempDirectory("graft-nested-drop")
    writeNestedFile(drop, "drop-000.parquet",
      rows = Seq(Row(3L, Row(30L, "z"), Seq("t3"))))
    val r = e.adoptFiles("ext.adoptive", drop.toString)
    assert(r.addedRecords == 1L)

    // a drop whose member b is stamped with a DIVERGENT id refuses,
    // naming the dotted path (same member names, so only the nested id
    // gate can catch it)
    val bad = Files.createTempDirectory("graft-nested-bad")
    writeNestedFile(bad, "bad-000.parquet",
      rows = Seq(Row(9L, Row(90L, "w"), Seq.empty[String])), bFooterId = 9)
    val ex = intercept[IllegalArgumentException](
      e.adoptFiles("ext.adoptive", bad.toString))
    assert(ex.getMessage.contains("NESTED") && ex.getMessage.contains("s.b"),
      ex.getMessage)

    // a FOREIGN nested rename (member b → bb, same id 4): the adopted
    // file's member keeps serving by field id
    val (mdNow, vNow) = IcebergMeta.loadVersioned(tableDir)
    val md2 = mdNow.copy(currentSchemaId = 1,
      schemas = mdNow.schemas :+ IceSchema(1, schemaFields("bb")))
    IcebergMeta.publish(
      dir.resolve(s"metadata/v${vNow + 1}.metadata.json"),
      IcebergMeta.render(md2))
    val got = new Engine(spark, wh).readTable("ext.adoptive")
      .select(col("id"), col("s.a"), col("s.bb"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "z")),
      s"adopted nested file must serve its renamed member by id, got $got")
    assert(new Engine(spark, wh).readTable("ext.adoptive").count() == 3L)
  }

  test("map and struct-in-struct columns: the declared-schema rebuild " +
      "covers every nesting shape, and a DEEP member rename reads by id") {
    val wh = Files.createTempDirectory("graft-nested2-wh").toString
    val tableDir = s"$wh/ext/deep"
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("data"))
    Files.createDirectories(dir.resolve("metadata"))

    val fileSchema = StructType(Seq(
      StructField("id", LongType, nullable = false, idMeta(1)),
      StructField("attrs", MapType(StringType, LongType,
        valueContainsNull = true), nullable = true, idMeta(2)),
      StructField("s", StructType(Seq(
        StructField("inner", StructType(Seq(
          StructField("x", LongType, nullable = true, idMeta(7)))),
          nullable = true, idMeta(6)))), nullable = true, idMeta(5))))
    val rows = Seq(
      Row(1L, Map("a" -> 1L, "b" -> 2L), Row(Row(10L))),
      Row(2L, Map("c" -> 3L), Row(Row(20L))))
    val tmp = Files.createTempDirectory("graft-nested2-stage")
    spark.createDataFrame(rows.asJava, fileSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dir.resolve("data/deep-000.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val size = Files.size(dir.resolve("data/deep-000.parquet"))

    val attrsJson =
      """{"type":"map","key-id":3,"key":"string","value-id":4,"value":"long","value-required":false}"""
    def sJson(xName: String): String =
      (s"""{"type":"struct","fields":[{"id":6,"name":"inner","required":false,
          |"type":{"type":"struct","fields":[
          |{"id":7,"name":"$xName","required":false,"type":"long"}]}}]}""")
        .stripMargin.replace("\n", "")
    def fields(xName: String): Seq[SchemaField] = Seq(
      SchemaField(1, "id", required = true, "long", "id"),
      SchemaField(2, "attrs", required = false, "map<string, long>",
        "attrs", attrsJson),
      SchemaField(5, "s", required = false,
        s"struct<inner: struct<$xName: long>>", "s", sJson(xName)))

    val snapId = 7100L
    val entry = DataFileEntry(
      status = 1, snapshotId = snapId, content = 0,
      filePath = "data/deep-000.parquet", fileFormat = "PARQUET",
      partition = Map.empty, recordCount = 2L, fileSizeInBytes = size,
      columnSizes = Map.empty, valueCounts = Map.empty,
      nullValueCounts = Map.empty, lowerBounds = Map.empty,
      upperBounds = Map.empty, sequenceNumber = 1L)
    val manifestPath = s"metadata/manifest-$snapId.avro"
    AvroManifests.writeManifest(dir.resolve(manifestPath).toString, Seq(entry))
    val manifest = ManifestFile(
      manifestPath, Files.size(dir.resolve(manifestPath)), 0,
      content = 0, snapId, 1, 0, 0, 2L, 0, 0)
    val listPath = s"metadata/snap-$snapId.avro"
    AvroManifests.writeManifestList(dir.resolve(listPath).toString, Seq(manifest))
    val md = TableMetadata(2,
      java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      tableDir, 1700000000000L, 0,
      Seq(IceSchema(0, fields("x"))),
      0, Seq(PartitionSpec(0, Seq.empty)),
      Map(FieldIds.PropKey -> "true"),
      Some(snapId),
      Seq(Snapshot(snapId, None, 1700000000000L, "append",
        Map("operation" -> "append"), listPath,
        sequenceNumber = 1L, schemaId = Some(0))))
    Files.writeString(dir.resolve("metadata/v1.metadata.json"),
      IcebergMeta.render(md))

    val df = new Engine(spark, wh).readTable("ext.deep")
    assert(df.schema("attrs").dataType == MapType(StringType, LongType,
      valueContainsNull = true), "map column must rebuild from the path tree")
    val got = df.select(col("id"), col("attrs")("b"), col("s.inner.x"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 10L), (2L, -1L, 20L)))

    // DEEP rename: inner member x → y two levels down, same id 7
    val md2 = md.copy(currentSchemaId = 1,
      schemas = md.schemas :+ IceSchema(1, fields("y")))
    Files.writeString(dir.resolve("metadata/v2.metadata.json"),
      IcebergMeta.render(md2))
    val got2 = new Engine(spark, wh).readTable("ext.deep")
      .select(col("id"), col("s.inner.y"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((1L, 10L), (2L, 20L)),
      s"a rename two struct levels down must keep reading by id, got $got2")
  }
}
