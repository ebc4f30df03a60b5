package graft.sql

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.meta.IcebergTable

/** The DSv2 SQL WRITE surface: CREATE/DROP NAMESPACE, CREATE TABLE
  * (incl. partition transforms and CTAS), INSERT INTO / INSERT OVERWRITE
  * committing real Iceberg snapshots through [[graft.meta.TableWriter]],
  * ALTER TABLE column evolution, and DROP/RENAME TABLE — the full DDL+DML
  * life cycle with no engine API calls. */
class GraftSqlWriteSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-sqlw-wh").toString
    spark.conf.set("spark.sql.catalog.graftw", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftw.warehouse", dir)
    dir
  }

  import spark.implicits._

  test("CREATE TABLE + INSERT INTO commits snapshots; OVERWRITE keeps time travel") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.lake")
    spark.sql(
      """CREATE TABLE graftw.lake.orders
        |  (order_id BIGINT, region STRING, amount DOUBLE)
        |PARTITIONED BY (region)""".stripMargin)

    spark.sql(
      """INSERT INTO graftw.lake.orders VALUES
        |  (1, 'emea', 10.0), (2, 'emea', 20.0), (3, 'apac', 30.0)""".stripMargin)
    spark.sql("INSERT INTO graftw.lake.orders VALUES (4, 'apac', 40.0)")

    val rows = spark.sql(
      "SELECT order_id, region, amount FROM graftw.lake.orders ORDER BY order_id")
      .as[(Long, String, Double)].collect().toSeq
    assert(rows == Seq((1L, "emea", 10.0), (2L, "emea", 20.0),
      (3L, "apac", 30.0), (4L, "apac", 40.0)))

    // the commits are real Iceberg snapshots with partitioned data files
    val t = IcebergTable.load(s"$wh/lake/orders")
    val snaps = t.metadata.snapshots
    assert(snaps.map(_.operation) == Seq("append", "append"))
    assert(t.files().forall(_.partition.get("region").nonEmpty))
    val preOverwrite = snaps.last.snapshotId

    spark.sql("INSERT OVERWRITE graftw.lake.orders VALUES (9, 'emea', 90.0)")
    val after = spark.sql("SELECT order_id FROM graftw.lake.orders")
      .as[Long].collect().toSeq
    assert(after == Seq(9L))
    // prior snapshot still readable: SQL time travel
    val old = spark.sql(
      s"SELECT order_id FROM graftw.lake.orders VERSION AS OF $preOverwrite")
      .as[Long].collect().sorted.toSeq
    assert(old == Seq(1L, 2L, 3L, 4L))
  }

  test("bucket partition transform in DDL lays out files by bucket") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.lake")
    spark.sql(
      """CREATE TABLE graftw.lake.keyed (id BIGINT, payload STRING)
        |PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql(
      "INSERT INTO graftw.lake.keyed SELECT id, concat('p', id) FROM range(0, 100)")
    val t = IcebergTable.load(s"$wh/lake/keyed")
    val buckets = t.files().flatMap(_.partition.get("id_bucket")).toSet
    assert(buckets.nonEmpty && buckets.subsetOf(Set("0", "1", "2", "3")))
    assert(spark.sql("SELECT count(*) AS n FROM graftw.lake.keyed")
      .as[Long].head() == 100L)
  }

  test("CTAS creates and fills a table in one statement") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.lake")
    spark.sql(
      """CREATE TABLE graftw.lake.squares AS
        |SELECT id, id * id AS sq FROM range(0, 10)""".stripMargin)
    assert(spark.sql("SELECT sum(sq) AS s FROM graftw.lake.squares")
      .as[Long].head() == (0 until 10).map(i => i * i).sum)
    assert(Files.isDirectory(Paths.get(s"$wh/lake/squares/metadata")))
  }

  test("ALTER TABLE add/rename/drop column evolve the schema id-wise") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.lake")
    spark.sql("CREATE TABLE graftw.lake.ev (id BIGINT, name STRING)")
    spark.sql("INSERT INTO graftw.lake.ev VALUES (1, 'a')")

    spark.sql("ALTER TABLE graftw.lake.ev ADD COLUMN score DOUBLE")
    // old file projects the added column as null
    val r = spark.sql("SELECT id, name, score FROM graftw.lake.ev")
      .as[(Long, String, Option[Double])].head()
    assert(r == ((1L, "a", None)))
    spark.sql("INSERT INTO graftw.lake.ev VALUES (2, 'b', 0.5)")

    spark.sql("ALTER TABLE graftw.lake.ev RENAME COLUMN name TO label")
    spark.sql("ALTER TABLE graftw.lake.ev DROP COLUMN score")
    val cols = spark.sql("SELECT * FROM graftw.lake.ev").columns.toSeq
    assert(cols == Seq("id", "label"))
    assert(spark.sql("SELECT count(*) AS n FROM graftw.lake.ev")
      .as[Long].head() == 2L)
  }

  test("DELETE FROM rewrites matching files copy-on-write; reads stay SQL-native") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.lake")
    spark.sql(
      """CREATE TABLE graftw.lake.deldemo
        |  (id BIGINT, region STRING) PARTITIONED BY (region)""".stripMargin)
    spark.sql(
      """INSERT INTO graftw.lake.deldemo VALUES
        |  (1, 'emea'), (2, 'emea'), (3, 'apac'), (4, 'apac')""".stripMargin)

    spark.sql("DELETE FROM graftw.lake.deldemo WHERE region = 'emea' AND id < 2")
    val left = spark.sql("SELECT id FROM graftw.lake.deldemo ORDER BY id")
      .as[Long].collect().toSeq
    assert(left == Seq(2L, 3L, 4L))

    val t = IcebergTable.load(s"$wh/lake/deldemo")
    // copy-on-write: an overwrite snapshot (logical change — CDC-visible),
    // NO delete files — the SQL scan path stays valid; apac untouched
    assert(t.metadata.snapshots.last.operation == "overwrite")
    // SET/UNSET TBLPROPERTIES are metadata-only commits on the same table
    spark.sql("""ALTER TABLE graftw.lake.deldemo
      |SET TBLPROPERTIES ('write.distribution-mode' = 'none')""".stripMargin)
    assert(IcebergTable.load(s"$wh/lake/deldemo").metadata
      .properties.get("write.distribution-mode").contains("none"))
    spark.sql(
      "ALTER TABLE graftw.lake.deldemo UNSET TBLPROPERTIES ('write.distribution-mode')")
    assert(!IcebergTable.load(s"$wh/lake/deldemo").metadata
      .properties.contains("write.distribution-mode"))
    assert(t.deleteFiles().isEmpty)
    // rows in files without matches are not rewritten
    val apacFiles = t.files().filter(_.partition.get("region").contains("apac"))
    assert(apacFiles.nonEmpty)

    // deleting everything leaves an empty, still-readable table
    spark.sql("DELETE FROM graftw.lake.deldemo WHERE id > 0")
    assert(spark.sql("SELECT count(*) AS n FROM graftw.lake.deldemo")
      .as[Long].head() == 0L)
  }

  test("DROP TABLE removes the table; dropping a populated namespace needs CASCADE") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.tmp")
    spark.sql("CREATE TABLE graftw.tmp.gone (id BIGINT)")
    spark.sql("INSERT INTO graftw.tmp.gone VALUES (1)")
    assertThrows[Exception](spark.sql("DROP NAMESPACE graftw.tmp"))
    spark.sql("DROP TABLE graftw.tmp.gone")
    assert(!Files.exists(Paths.get(s"$wh/tmp/gone")))
    assert(spark.sql("SHOW TABLES IN graftw.tmp").count() == 0)
    spark.sql("DROP NAMESPACE graftw.tmp")
    assert(!Files.exists(Paths.get(s"$wh/tmp")))
  }

  test("SQL rename is read-safe and VERSION AS OF uses the snapshot's schema") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftw.evo")
    spark.sql("CREATE TABLE graftw.evo.m (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graftw.evo.m VALUES (1, 10), (2, 20)")
    val snap1 = IcebergTable.load(s"$wh/evo/m")
      .metadata.currentSnapshotId.get
    spark.sql("ALTER TABLE graftw.evo.m RENAME COLUMN v TO value")
    spark.sql("INSERT INTO graftw.evo.m VALUES (3, 30)")

    // current read: renamed column serves the pre-rename files' data
    // by field id, through the pure SQL path
    val cur = spark.sql(
      "SELECT id, value FROM graftw.evo.m ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(cur == Seq((1L, 10L), (2L, 20L), (3L, 30L)), cur.toString)

    // time travel: the pinned snapshot exposes ITS schema (`v`)
    val pinned = spark.sql(
      s"SELECT * FROM graftw.evo.m VERSION AS OF '$snap1' ORDER BY id")
    assert(pinned.columns.toSeq == Seq("id", "v"), pinned.columns.toSeq.toString)
    assert(pinned.as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))
  }
}
