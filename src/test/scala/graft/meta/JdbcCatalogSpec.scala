package graft.meta

import java.nio.file.Files

import graft.SparkSpec
import graft.fixtures.FixtureWriter

/** JDBC ("sql") catalog against embedded Derby (ships with Spark) — the
  * offline-testable half of pyiceberg's SqlCatalog backend. */
class JdbcCatalogSpec extends SparkSpec {

  test("JdbcCatalog: register/list/load/drop round-trip on embedded Derby") {
    val wh = Files.createTempDirectory("jdbcwh").toString
    FixtureWriter.writeDemo(spark, wh)
    val fs = new FsCatalog(wh)

    val cat = new JdbcCatalog("jdbc:derby:memory:cat1;create=true", "main")
    cat.init()
    cat.init() // idempotent

    assert(cat.listNamespaces().isEmpty)
    // adopt every fixture table by its current metadata file
    fs.listTables().foreach { case (ns, t) =>
      cat.register(s"$ns.$t",
        IcebergMeta.latestMetadataPath(fs.tableLocation(s"$ns.$t")).toString)
    }
    assert(cat.listNamespaces() == fs.listNamespaces())
    assert(cat.listTables() == fs.listTables())

    // load parses the pointed-at metadata and matches a filesystem load
    val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
    val viaJdbc = cat.loadTable(ref)
    val viaFs = fs.loadTable(ref)
    assert(viaJdbc.metadata.tableUuid == viaFs.metadata.tableUuid)
    assert(viaJdbc.metadata.currentSnapshotId == viaFs.metadata.currentSnapshotId)
    // and drives the real distributed scan machinery
    assert(graft.rel.MetaRelations.files(spark, viaJdbc).count() > 0)

    // the ENGINE FACADE runs over the JDBC catalog (no warehouse dir)
    val eng = new graft.api.Engine(spark, "", cat)
    assert(eng.listTables().count() == fs.listTables().size.toLong)
    assert(eng.summary(ref).collect().head.getAs[Long]("file_count") > 0)
    assert(eng.namespaceOverview().count() >= 1)

    // drop removes exactly that row
    cat.drop(ref)
    assert(!cat.listTables().map { case (n, t) => s"$n.$t" }.contains(ref))
    val err = intercept[IllegalArgumentException](cat.loadTable(ref))
    assert(err.getMessage.contains("not found"))
  }

  test("forConfig routes sql/jdbc configs to JdbcCatalog") {
    val cat = Catalogs.forConfig(CatalogConfig(
      "c2", Some("jdbc:derby:memory:cat2;create=true"), None,
      Map("type" -> "sql")))
    assert(cat.isInstanceOf[JdbcCatalog])
    cat.asInstanceOf[JdbcCatalog].init()
    assert(cat.listNamespaces().isEmpty)
    // jdbc: scheme auto-detects without an explicit type
    val cat3 = Catalogs.forConfig(CatalogConfig(
      "c3", Some("jdbc:derby:memory:cat2"), None))
    assert(cat3.isInstanceOf[JdbcCatalog])
    // separate catalog_name spaces on one database are isolated
    val a = new JdbcCatalog("jdbc:derby:memory:cat4;create=true", "a")
    val b = new JdbcCatalog("jdbc:derby:memory:cat4", "b")
    a.init(); b.init()
    a.register("ns.t1", "/nowhere/v1.metadata.json")
    assert(a.listTables() == Seq("ns" -> "t1"))
    assert(b.listTables().isEmpty)
  }
}
