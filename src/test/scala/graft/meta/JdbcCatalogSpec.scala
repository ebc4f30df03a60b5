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

  test("engine commits MIRROR into the JDBC pointer: a fresh forConfig " +
      "engine sees every snapshot, DDL included") {
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("jdbcwh-commit").toString
    val cfg = CatalogConfig("main", Some("jdbc:derby:memory:catc1;create=true"),
      Some(wh), Map("type" -> "sql"))
    val e1 = graft.api.Engine.forConfig(spark, cfg)
    e1.catalog.asInstanceOf[JdbcCatalog].init()

    // CREATE through the pointer catalog: location resolves under the
    // configured warehouse and the pointer registers at v1
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    e1.createTable("ns.t", df.schema)
    val cat = new JdbcCatalog("jdbc:derby:memory:catc1", "main")
    val p1 = cat.metadataPointer("ns.t")
    assert(p1.exists(_.endsWith("v1.metadata.json")), p1.toString)
    assert(p1.get.startsWith(wh), "created table must live under the warehouse")

    // a data commit advances the pointer; a FRESH engine over the same
    // catalog reads the new snapshot THROUGH the pointer
    e1.append("ns.t", df)
    val e2 = graft.api.Engine.forConfig(spark, cfg)
    assert(e2.readTable("ns.t").count() == 2L)
    assert(cat.metadataPointer("ns.t").exists(_.endsWith("v2.metadata.json")))
    assert(cat.loadTable("ns.t").metadata.currentSnapshotId ==
      IcebergMeta.load(e1.tableDir("ns.t")).currentSnapshotId,
      "the pointed metadata must BE the committed metadata")

    // writes through the second engine chain on: every verb mirrors
    e2.append("ns.t", Seq((3L, "c")).toDF("id", "name"))
    e2.addColumn("ns.t", "note", "string")
    val e3 = graft.api.Engine.forConfig(spark, cfg)
    assert(e3.readTable("ns.t").count() == 3L)
    assert(e3.readTable("ns.t").columns.contains("note"),
      "DDL must be visible through a fresh catalog client")
    assert(e3.deleteWhere("ns.t", col("id") === 2L).nonEmpty)
    assert(graft.api.Engine.forConfig(spark, cfg)
      .readTable("ns.t").count() == 2L)

    // a SECOND create of the same ref refuses loudly (the pointer
    // resolves it to the existing directory; true races settle at the
    // v1 publish CAS)
    val exists = intercept[IllegalArgumentException](
      e3.createTable("ns.t", df.schema))
    assert(exists.getMessage.contains("already exists"), exists.getMessage)
  }

  test("pointer CAS: a stale expected loses with CommitConflictException; " +
      "a foreign-owned pointer refuses the mirror without clobbering") {
    import spark.implicits._
    val wh = Files.createTempDirectory("jdbcwh-cas").toString
    val cfg = CatalogConfig("main", Some("jdbc:derby:memory:catc2;create=true"),
      Some(wh), Map("type" -> "sql"))
    val e = graft.api.Engine.forConfig(spark, cfg)
    val cat = e.catalog.asInstanceOf[JdbcCatalog]
    cat.init()
    val df = Seq((1L, "a")).toDF("id", "name")
    e.createTable("ns.cas", df.schema)
    e.append("ns.cas", df)
    val cur = cat.metadataPointer("ns.cas").get

    // direct CAS with a stale expected: the guarded UPDATE touches no
    // row and surfaces the optimistic-concurrency loss
    val err = intercept[CommitConflictException](
      cat.casPointer("ns.cas", Some("/stale/v1.metadata.json"), "/x/v9.metadata.json"))
    assert(err.getMessage.contains("concurrent"), err.getMessage)
    assert(cat.metadataPointer("ns.cas").contains(cur), "loser must not move the pointer")
    // CAS-create on an existing row loses the same way
    intercept[CommitConflictException](
      cat.casPointer("ns.cas", None, "/x/v9.metadata.json"))

    // a foreign writer takes the pointer (real-Iceberg metadata naming,
    // same table dir): the next engine commit LANDS path-addressed but
    // refuses to clobber the pointer, with an error naming both sides —
    // not a conflict exception, which would invite a duplicate-commit
    // retry
    val foreignLoc = java.nio.file.Paths
      .get(e.tableDir("ns.cas"), "metadata", "00003-abc123.metadata.json")
    Files.copy(java.nio.file.Paths.get(cur), foreignLoc)
    cat.register("ns.cas", foreignLoc.toString)
    val ex = intercept[IllegalStateException](e.append("ns.cas", df))
    assert(ex.getMessage.contains("foreign metadata") &&
      ex.getMessage.contains("landed path-addressed"), ex.getMessage)
    assert(cat.metadataPointer("ns.cas").contains(foreignLoc.toString),
      "the foreign pointer must survive")
    // the path commit itself landed (engine path-truth semantics)
    assert(IcebergMeta.load(e.tableDir("ns.cas")).snapshots.size == 2)

    // restoring the pointer into the lineage lets the next sync heal
    // everything forward monotonically
    cat.register("ns.cas", cur)
    e.append("ns.cas", df)
    assert(cat.metadataPointer("ns.cas").exists(_.endsWith("v4.metadata.json")),
      cat.metadataPointer("ns.cas").toString)
    assert(graft.api.Engine.forConfig(spark, cfg).readTable("ns.cas").count() == 3L)
  }

  test("registerParquet failure cleanup drops the pointer row it " +
      "registered — no dangling pointer at a deleted path") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val wh = Files.createTempDirectory("jdbcwh-reg").toString
    val cfg = CatalogConfig("main", Some("jdbc:derby:memory:catc3;create=true"),
      Some(wh), Map("type" -> "sql"))
    val e = graft.api.Engine.forConfig(spark, cfg)
    val cat = e.catalog.asInstanceOf[JdbcCatalog]
    cat.init()
    // a drop whose footer is healthy but whose data pages are corrupt:
    // registerParquet creates + registers the table, then the stats
    // pass fails and the cleanup must remove BOTH the dir and the row
    val drop = Files.createTempDirectory("jdbc-reg-drop")
    (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(drop.toString)
    val f = Files.list(drop).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val bytes = Files.readAllBytes(f)
    java.util.Arrays.fill(bytes, 8, 1000, 0xFF.toByte)
    Files.write(f, bytes)
    // the legacy agg stats source reads data pages inside the commit —
    // the injected page corruption then fails registration mid-way,
    // which is the cleanup window this test pins (the default footer
    // source adopts on footer facts alone and would not trip here)
    spark.conf.set(graft.meta.TableWriter.StatsSourceKey, "agg")
    try intercept[Exception](e.registerParquet("ns.broken", drop.toString))
    finally spark.conf.unset(graft.meta.TableWriter.StatsSourceKey)
    assert(cat.metadataPointer("ns.broken").isEmpty,
      "the failed registration must not leave a pointer row")
    assert(!Files.exists(java.nio.file.Paths.get(wh, "ns", "broken")))
    // a healthy registration through the same engine works end to end
    val good = Files.createTempDirectory("jdbc-reg-good")
    Seq((1L, "x"), (2L, "y")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(good.toString)
    e.registerParquet("ns.good", good.toString)
    assert(graft.api.Engine.forConfig(spark, cfg)
      .readTable("ns.good").count() == 2L)
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
