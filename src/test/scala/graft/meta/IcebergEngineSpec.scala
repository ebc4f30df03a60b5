package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter
import graft.ops.Watch

/** Fixture-backed engine invariants mirroring the reference's test suite
  * (ref `dev/tests/test_health.py`, `test_diff.py`, `test_cli.py`). */
class IcebergEngineSpec extends SparkSpec {

  lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-warehouse").toString
    FixtureWriter.writeDemo(spark, dir)
    dir
  }
  lazy val engine = new Engine(spark, warehouse)

  test("list-tables walks namespaces") {
    val tables = engine.listTables().collect().map(r => s"${r.getString(0)}.${r.getString(1)}")
    assert(tables.toSet == Set(
      "sales.orders", "sales.customers", "analytics.events", "staging.metrics",
      "legacy.inventory"))
  }

  test("format-v1 table loads end-to-end: singular schema/spec keys parse") {
    val t = engine.load("legacy.inventory")
    assert(t.metadata.formatVersion == 1)
    assert(t.metadata.currentSchemaId == 0)
    assert(t.metadata.currentSpec.fields.map(_.name) == Seq("warehouse_id"))
    // files flow through the normal manifest reader
    assert(engine.files("legacy.inventory")
      .agg(sum("record_count")).collect().head.getLong(0) == 123L) // 40+41+42
    val s = engine.summary("legacy.inventory").collect().head
    assert(s.getAs[Long]("total_records") == 123L)
  }

  test("nested struct/list types render recursively and flatten with paths") {
    val t = engine.load("legacy.inventory")
    val byPath = t.metadata.currentSchema.fields.map(f => f.path -> f).toMap
    assert(byPath("attrs").fieldType == "struct<color: string, weight_kg: double>")
    assert(byPath("attrs.color").fieldType == "string")
    assert(byPath("attrs.weight_kg").id == 5)
    assert(byPath("tags").fieldType == "list<string>")
    assert(byPath("tags.element").id == 7)
    // schemas relation carries the dotted path column
    val rel = graft.rel.MetaRelations.schemas(spark, t)
    val paths = rel.select("field_path").collect().map(_.getString(0)).toSet
    assert(paths.contains("attrs.color") && paths.contains("tags.element"))
  }

  test("parse→render→parse of a nested schema preserves the structured types") {
    val md = engine.load("legacy.inventory").metadata
    val back = IcebergMeta.parse(IcebergMeta.render(md))
    // the re-parsed schema must flatten identically — in particular the
    // nested struct/list children must survive with ids, paths and types
    assert(back.currentSchema.fields == md.currentSchema.fields)
    assert(back.currentSpec == md.currentSpec)
    // and the rendered JSON must carry a structured type node, not the
    // flattened display string, for the struct field
    val json = IcebergMeta.render(md)
    assert(!json.contains("\"struct<"))
  }

  test("FsCatalog walks the same tables the Engine sees and loads them") {
    val cat = new FsCatalog(warehouse)
    assert(cat.listNamespaces().toSet == Set("sales", "analytics", "staging", "legacy"))
    assert(cat.listTables().map { case (ns, t) => s"$ns.$t" }.toSet ==
      engine.listTables().collect().map(r => s"${r.getString(0)}.${r.getString(1)}").toSet)
    assert(cat.loadTable("legacy.inventory").metadata.formatVersion == 1)
    // config-driven construction reaches the same warehouse
    val e2 = Engine.forConfig(spark, CatalogConfig("demo", None, Some(warehouse)))
    assert(e2.listTables().count() == 5L)
  }

  test("format-version census sees the mixed v1/v2 warehouse") {
    val census = engine.formatVersionCensus().collect()
      .map(r => r.getAs[Int]("format_version") -> r.getAs[Long]("table_count")).toMap
    assert(census == Map(1 -> 1L, 2 -> 4L))
  }

  test("orders health: file stats and manifest census are positive") {
    // ref test_health.py:13-24
    val h = engine.health("sales.orders")
    val fs = h.fileStats.collect().head
    assert(fs.getAs[Long]("file_count") > 0)
    assert(fs.getAs[Long]("total_bytes") > 0)
    val mc = h.manifestCensus.collect().head
    assert(mc.getAs[Long]("data_manifests") > 0)
    assert(mc.getAs[Long]("delete_manifests") == 0)
  }

  test("orders health: required order_id has null pct exactly 0.0") {
    // ref test_health.py asserts order_id null-pct == 0.0
    val h = engine.health("sales.orders")
    val row = h.nullRates.filter(col("field_name") === "order_id").collect().head
    assert(row.getAs[Double]("null_pct") == 0.0)
  }

  test("orders health: column share contains every column and sums to ~100") {
    val h = engine.health("sales.orders")
    val rows = h.columnShare.collect()
    assert(rows.map(_.getAs[String]("field_name")).toSet.contains("amount"))
    val pctSum = rows.map(_.getAs[Double]("pct_of_total")).sum
    assert(math.abs(pctSum - 100.0) < 0.01)
  }

  test("orders health: decoded order_id bounds cover the overwritten id range") {
    val h = engine.health("sales.orders")
    val idRow = h.columnBounds.filter(col("field_name") === "order_id").collect().head
    // after overwrite(1..15) the live set is exactly ids 1..15
    assert(idRow.getAs[Double]("min_value") == 1.0)
    assert(idRow.getAs[Double]("max_value") == 15.0)
  }

  test("snapshot pinning: pre-overwrite snapshot still sees 60 rows") {
    val t = engine.load("sales.orders")
    val snaps = t.metadata.snapshots.map(_.snapshotId)
    val preOverwrite = engine.files("sales.orders", Some(snaps(2)))
    val current = engine.files("sales.orders")
    assert(preOverwrite.agg(sum("record_count")).collect().head.getLong(0) == 60L)
    assert(current.agg(sum("record_count")).collect().head.getLong(0) == 15L)
  }

  test("diff: append snapshot has added>0 and deleted==0") {
    // ref test_diff.py:10-26
    val t = engine.load("sales.orders")
    val ids = t.metadata.snapshots.map(_.snapshotId)
    val d = engine.diff("sales.orders", ids(0), ids(1))
    assert(d.added.count() > 0)
    assert(d.deleted.count() == 0)
    val net = d.totals.filter(col("side") === "net").collect().head
    assert(net.getAs[Long]("files") > 0)
  }

  test("diff: overwrite snapshot both adds and deletes") {
    val t = engine.load("sales.orders")
    val ids = t.metadata.snapshots.map(_.snapshotId)
    val d = engine.diff("sales.orders", ids(2), ids(3))
    assert(d.added.count() > 0)
    assert(d.deleted.count() > 0)
    assert(d.operation == "overwrite")
  }

  test("diff: unknown snapshot id raises") {
    intercept[NoSuchElementException] {
      engine.diff("sales.orders", 1000L, 999999L)
    }
  }

  test("schema evolution: customers v0→v1 diff reports the added fields") {
    val diff = engine.schemaDiff("sales.customers", 0, 1).collect()
    val byId = diff.map(r => r.getAs[Int]("field_id") -> r.getAs[String]("status")).toMap
    assert(byId(4) == "added") // phone
    assert(byId(5) == "added") // signup_date
    assert(byId(1) == "same")
  }

  test("summary: one row with positive metrics and correct snapshot count") {
    val s = engine.summary("analytics.events").collect().head
    assert(s.getAs[Long]("file_count") > 0)
    assert(s.getAs[Long]("total_records") == 75L)
    assert(s.getAs[Int]("snapshot_count") == 3)
  }

  test("partitions: orders grouped by region partition") {
    val parts = engine.partitions("sales.orders").collect()
    assert(parts.length > 1) // multiple regions live after overwrite
    assert(parts.map(_.getAs[Long]("record_count")).sum == 15L)
  }

  test("namespace + warehouse overview use summary totals (no manifest IO)") {
    val ns = engine.namespaceOverview().collect()
    assert(ns.map(_.getAs[String]("namespace")).toSet ==
      Set("sales", "analytics", "staging", "legacy"))
    val wh = engine.warehouseOverview().collect()
    val grand = wh.find(_.isNullAt(0)).get
    assert(grand.getAs[Long]("table_count") == 5L)
    // orders live 15 + customers 20 + events 75 + metrics 12 + inventory 123
    assert(grand.getAs[Long]("total_records") == 245L)
  }

  test("watch: second poll flags only fresh snapshots") {
    val dir = engine.tableDir("analytics.events")
    val p1 = Watch.poll(spark, dir, Set.empty)
    assert(p1.newSnapshots.count() == 3)
    val p2 = Watch.poll(spark, dir, p1.seenIds)
    assert(p2.newSnapshots.count() == 0)
    val p3 = Watch.poll(spark, dir, p1.seenIds -- Set(p1.seenIds.max))
    assert(p3.newSnapshots.count() == 1)
  }

  test("empty table: zero-file health sections stay consistent") {
    // ref test_health.py:43-53
    val dir = Files.createTempDirectory("graft-empty").toString
    FixtureWriter.writeTable(spark, s"$dir/ns/empty",
      Seq(Seq(FixtureWriter.ColSpec(1, "id", "long", required = true))),
      None, Seq.empty)
    val e2 = new Engine(spark, dir)
    val s = e2.summary("ns.empty").collect().head
    assert(s.getAs[Long]("file_count") == 0L)
    assert(s.getAs[Long]("total_records") == 0L)
  }

  test("tree view: per-manifest shares sum to 100% with size colors") {
    val rows = engine.tree("analytics.events").collect()
    assert(rows.length == 3) // one manifest per append
    assert(math.abs(rows.map(_.getAs[Double]("pct_of_rows")).sum - 100.0) < 0.1)
    assert(rows.forall(r =>
      Set("green", "yellow", "red").contains(r.getAs[String]("size_color"))))
  }

  test("render layer: schema tree nests children, metadata tree lists manifests") {
    val schemaTxt = engine.renderSchema("legacy.inventory")
    assert(schemaTxt.startsWith("Schema (id=0)"))
    assert(schemaTxt.contains("- attrs : struct<color: string, weight_kg: double> (optional, id=3)"))
    // nested child indents one level under its parent
    assert(schemaTxt.contains("\n  - color : string (optional, id=4)"))
    val treeTxt = engine.renderTree("analytics.events")
    assert(treeTxt.startsWith("analytics.events (snapshot 1002)"))
    assert(treeTxt.linesIterator.count(_.startsWith("└──")) == 3)
    assert(treeTxt.contains("% of rows"))
  }

  test("namespace health fan-out covers every table in the namespace") {
    val reports = engine.healthNamespace("sales")
    assert(reports.keySet == Set("sales.orders", "sales.customers"))
    assert(reports("sales.customers").fileStats.collect().head
      .getAs[Long]("file_count") > 0)
  }

  test("recent ops lists newest snapshots first") {
    val ops = engine.recentOps("sales.orders").collect()
    assert(ops.length == 4)
    assert(ops.head.getAs[String]("operation") == "overwrite")
  }
}
