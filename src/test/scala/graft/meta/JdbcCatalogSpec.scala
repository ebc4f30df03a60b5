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
    // doctor on a catalog-backed engine reports the CATALOG's health,
    // not a bogus "warehouse FAIL" for the empty directory string
    val doc = eng.doctor().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(doc.get("catalog").contains("OK"), doc.toString)
    assert(!doc.contains("warehouse"), doc.toString)

    // drop removes exactly that row
    cat.drop(ref)
    assert(!cat.listTables().map { case (n, t) => s"$n.$t" }.contains(ref))
    val err = intercept[IllegalArgumentException](cat.loadTable(ref))
    assert(err.getMessage.contains("not found"))
  }

  test("CLI drives table-info over the JDBC catalog end-to-end (jdbc: uri arg)") {
    val wh = Files.createTempDirectory("jdbcwh4").toString
    FixtureWriter.writeDemo(spark, wh)
    val fs = new FsCatalog(wh)
    // the CLI routes jdbc: uris through forConfig, which names the
    // catalog after the config entry ("cli" by default) — register under
    // that name so the CLI's catalog sees the rows
    val cat = new JdbcCatalog("jdbc:derby:memory:cat6;create=true", "cli")
    cat.init()
    fs.listTables().foreach { case (ns, t) =>
      cat.register(s"$ns.$t",
        IcebergMeta.latestMetadataPath(fs.tableLocation(s"$ns.$t")).toString)
    }
    val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
    assert(graft.tools.Cli.run(Array(
      "jdbc:derby:memory:cat6", "table-info", ref)) == 0)
    assert(graft.tools.Cli.run(Array(
      "jdbc:derby:memory:cat6", "list-tables")) == 0)
  }

  test("register is an upsert; NULL and remote metadata locations surface typed errors") {
    val wh = Files.createTempDirectory("jdbcwh3").toString
    FixtureWriter.writeDemo(spark, wh)
    val fs = new FsCatalog(wh)
    val cat = new JdbcCatalog("jdbc:derby:memory:cat5;create=true", "main")
    cat.init()
    val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
    val loc = IcebergMeta.latestMetadataPath(fs.tableLocation(ref)).toString

    // re-registering the same ref must MOVE the pointer, not throw a raw
    // PK violation
    cat.register(ref, "/elsewhere/v1.metadata.json")
    cat.register(ref, loc)
    assert(cat.loadTable(ref).metadata.tableUuid ==
      fs.loadTable(ref).metadata.tableUuid)
    assert(cat.listTables().count(_ == (ref.split("\\.", 2) match {
      case Array(n, t) => (n, t) })) == 1)

    // a production-style s3:// pointer fails with a descriptive error,
    // not Paths.get's InvalidPathException
    cat.register("ns.remote", "s3://bucket/warehouse/t/metadata/v1.metadata.json")
    val remoteErr = intercept[IllegalStateException](cat.loadTable("ns.remote"))
    assert(remoteErr.getMessage.contains("s3://") &&
      remoteErr.getMessage.contains("unsupported"), remoteErr.getMessage)

    // a NULL metadata_location row (in-flight commit / foreign writer)
    // is a descriptive IllegalStateException, not an NPE
    scala.util.Using.resource(
      java.sql.DriverManager.getConnection("jdbc:derby:memory:cat5")) { c =>
      scala.util.Using.resource(c.prepareStatement(
        "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, " +
          "metadata_location, previous_metadata_location) VALUES ('main', 'ns', 'hollow', NULL, NULL)")) { ps =>
        ps.executeUpdate(); ()
      }
    }
    val nullErr = intercept[IllegalStateException](cat.loadTable("ns.hollow"))
    assert(nullErr.getMessage.contains("metadata_location is NULL"), nullErr.getMessage)
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
