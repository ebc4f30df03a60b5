package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** Engine-driven schema evolution: add/rename/drop as metadata commits,
  * id-based diffs, current-schema projection on reads, and appends under
  * the evolved schema. */
class SchemaEvolutionSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-evo-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    dir
  }
  private lazy val engine = new Engine(spark, warehouse)

  import spark.implicits._

  test("addColumn: new version, diff shows added, old files read as null") {
    val sid = engine.addColumn("staging.metrics", "zone", "string")
    val md = engine.load("staging.metrics").metadata
    assert(md.currentSchemaId == sid && md.schemas.size == 2)

    // id-based diff: exactly one added field, nothing dropped/changed
    val d = engine.schemaDiff("staging.metrics", 0, sid).collect()
    assert(d.count(_.getAs[String]("status") == "added") == 1)
    assert(d.forall(r => r.getAs[String]("status") == "added" ||
      r.getAs[String]("status") == "same"))

    // current-schema projection: pre-evolution files surface a null zone
    val read = engine.readTable("staging.metrics")
    assert(read.columns.last == "zone")
    assert(read.filter(col("zone").isNull).count() == read.count())

    // appends under the evolved schema carry values; old rows stay null
    val df = Seq((300L, "host-z", "api", 1.0, 1.0, 1L, 1L, 0, 10, true,
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00"), "eu-zone-1"))
      .toDF("metric_id", "host", "service", "cpu_pct", "mem_pct",
        "disk_read_bytes", "net_rx_bytes", "error_count", "request_count",
        "is_healthy", "collected_at", "zone")
    engine.append("staging.metrics", df)
    val after = engine.readTable("staging.metrics")
    assert(after.filter(col("zone") === "eu-zone-1").count() == 1L)
    assert(after.filter(col("zone").isNull).count() == after.count() - 1)
  }

  test("renameColumn keeps the field id (diff says changed, not add+drop)") {
    val wh = Files.createTempDirectory("graft-evo2-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new Engine(spark, wh)
    val oldId = e.load("sales.customers").metadata.currentSchema
      .fields.find(_.name == "email").get.id
    val sid = e.renameColumn("sales.customers", "email", "email_address")
    val cur = e.load("sales.customers").metadata.currentSchema
    assert(cur.fields.find(_.name == "email_address").get.id == oldId)
    val d = e.schemaDiff("sales.customers", sid - 1, sid).collect()
    assert(d.count(_.getAs[String]("status") == "changed") == 1)
    assert(!d.exists(r => Set("added", "removed").contains(r.getAs[String]("status"))))
  }

  test("setPartitionSpec: future writes use the new layout, old files keep theirs") {
    val wh = Files.createTempDirectory("graft-spec-evo-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new Engine(spark, wh)
    // staging.metrics starts unpartitioned; evolve to identity(service)
    val sid = e.setPartitionSpec("staging.metrics", Seq("service"))
    val md = e.load("staging.metrics").metadata
    assert(md.defaultSpecId == sid && md.partitionSpecs.size == 2)
    assert(md.currentSpec.fields.map(f => (f.name, f.transform)) ==
      Seq(("service", "identity")))
    assert(md.currentSpec.fields.head.fieldId >= 1000)

    val df = Seq(
      (400L, "h", "api", 1.0, 1.0, 1L, 1L, 0, 1, true,
        java.sql.Timestamp.valueOf("2024-08-02 00:00:00")),
      (401L, "h", "web", 1.0, 1.0, 1L, 1L, 0, 1, true,
        java.sql.Timestamp.valueOf("2024-08-02 00:00:00")))
      .toDF("metric_id", "host", "service", "cpu_pct", "mem_pct",
        "disk_read_bytes", "net_rx_bytes", "error_count", "request_count",
        "is_healthy", "collected_at")
    val r = e.append("staging.metrics", df)
    assert(r.addedFiles == 2) // one per service value under the new spec

    // mixed layouts coexist: old file has an empty partition tuple, new
    // files carry service=..., and reads see every row
    val parts = e.files("staging.metrics")
      .select("partition").collect().map(_.getMap[String, String](0))
    assert(parts.exists(_.isEmpty) && parts.exists(_.get("service").contains("api")))
    assert(e.readTable("staging.metrics").count() == 14L) // 12 fixture + 2

    intercept[IllegalArgumentException] {
      e.setPartitionSpec("staging.metrics", Seq("no_such_col"))
    }
  }

  test("dropColumn removes from reads; partition sources are protected") {
    val wh = Files.createTempDirectory("graft-evo3-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new Engine(spark, wh)
    e.dropColumn("staging.metrics", "disk_read_bytes")
    assert(!e.readTable("staging.metrics").columns.contains("disk_read_bytes"))
    intercept[IllegalArgumentException] {
      e.dropColumn("sales.orders", "region") // identity partition source
    }
  }

  test("setSortOrder: metadata round-trips and writes produce sorted files") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-sort-t").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("amount", DoubleType))), Seq("grp"))

    val oid = SchemaEvolution.setSortOrder(dir, Seq("amount desc"))
    val md = IcebergMeta.load(dir)
    assert(md.defaultSortOrderId == oid)
    val so = md.defaultSortOrder.get
    assert(so.fields.map(f => (f.direction, f.nullOrder)) ==
      Seq(("desc", "nulls-last")))
    // JSON round trip preserves the order
    assert(IcebergMeta.parse(IcebergMeta.render(md)).defaultSortOrder.contains(so))

    // append deliberately unsorted rows; every written file must hold a
    // sorted run (desc by amount)
    val rng = new scala.util.Random(7)
    val rows = (1 to 300).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", rng.nextDouble() * 100))
    TableWriter.append(spark, dir, rows.toDF("id", "grp", "amount"))
    val t = IcebergTable.load(dir)
    assert(t.files().nonEmpty)
    t.files().foreach { e =>
      val vals = spark.read.parquet(t.resolvePath(e.filePath))
        .select("amount").collect().map(_.getDouble(0)).toSeq
      assert(vals == vals.sortBy(-_), s"${e.filePath} is not desc-sorted")
    }

    // reset to unsorted
    assert(SchemaEvolution.setSortOrder(dir, Seq.empty) == 0)
    assert(IcebergMeta.load(dir).defaultSortOrder.isEmpty)
  }

  test("write.distribution-mode=range yields non-overlapping sort-key file ranges") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-range-t").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType))),
      properties = Map("write.distribution-mode" -> "range"))
    SchemaEvolution.setSortOrder(dir, Seq("id"))

    val rng = new scala.util.Random(11)
    val rows = rng.shuffle((1L to 2000L).toList).map(i => (i, s"p$i"))
    // at test scale AQE would coalesce the tiny range shuffle to one
    // partition (at real scale it sizes partitions to the advisory
    // target); pin it off so multiple files materialize
    val prior = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      TableWriter.append(spark, dir, rows.toDF("id", "payload").repartition(4))
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prior)

    val t = IcebergTable.load(dir)
    val idField = t.metadata.currentSchema.fields.find(_.name == "id").get
    val ranges = t.files().map { e =>
      (graft.expr.IcebergDecode.decodeNumeric("long", e.lowerBounds(idField.id)).get,
        graft.expr.IcebergDecode.decodeNumeric("long", e.upperBounds(idField.id)).get)
    }.sortBy(_._1)
    assert(ranges.size > 1, "expected multiple range-distributed files")
    // table-wide NON-overlapping id ranges: each file's upper stays below
    // the next file's lower
    ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file ranges: $ranges")
    }
  }

  test("widenColumn: int→long keeps the field id; one scan reads old and new files") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-widen").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType),
      StructField("ratio", FloatType))))
    TableWriter.append(spark, dir,
      Seq((1L, 10, 1.5f), (2L, 20, 2.5f)).toDF("id", "qty", "ratio"))

    // narrowing and no-ops are rejected
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumn(dir, "id", "int")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumn(dir, "qty", "double")
    }

    val beforeId = IcebergMeta.load(dir).currentSchema
      .fields.find(_.name == "qty").get.id
    SchemaEvolution.widenColumn(dir, "qty", "long")
    SchemaEvolution.widenColumn(dir, "ratio", "double")
    val md = IcebergMeta.load(dir)
    val qty = md.currentSchema.fields.find(_.name == "qty").get
    assert(qty.id == beforeId && qty.fieldType == "long")

    // append under the WIDE schema; one scan reads both generations
    TableWriter.append(spark, dir,
      Seq((3L, 5000000000L, 9.25)).toDF("id", "qty", "ratio"))
    val t = IcebergTable.load(dir)
    val got = graft.ops.ScanPlanner.readTable(spark, t)
      .select("id", "qty", "ratio").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, 1.5), (2L, 20L, 2.5), (3L, 5000000000L, 9.25)))

    // manifest bounds of the OLD (4-byte) files still decode under the
    // widened type: range pruning keeps the narrow file for qty<=20 and
    // drops it for qty>=1e9
    val files = graft.rel.MetaRelations.files(spark, t)
    val wide = graft.ops.ScanPlanner.pruneFiles(
      spark, t, files, "qty", Some(1e9), None).count()
    assert(wide >= 1 && wide < t.files().size)

    // schema-history diff renders the type change on the same field id
    val hist = graft.rel.MetaRelations.schemas(spark, t)
    def attrs(id: Int) = hist.filter(col("schema_id") === id)
      .select(col("field_id"),
        concat_ws(":", col("field_name"), col("field_type"), col("required"))
          .as("attr"))
    val d = graft.ops.SchemaDiff
      .diff(attrs(0), attrs(md.currentSchemaId), "field_id", "attr")
      .filter(col("status") === "changed").collect()
    assert(d.exists(_.getAs[Number]("field_id").intValue == beforeId))
  }
}
