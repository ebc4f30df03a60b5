package graft.sql

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.IcebergTable

/** `CALL graft.system.<proc>(...)` — maintenance as DSv2 stored
  * procedures ([[GraftProcedures]]). */
class ProcedureSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-proc-wh").toString
    spark.conf.set("spark.sql.catalog.graftc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftc.warehouse", dir)
    dir
  }

  import spark.implicits._

  test("CALL rewrite_manifests / rollback / analyze run and report") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftc.lake")
    spark.sql(
      """CREATE TABLE graftc.lake.calls (id BIGINT, grp STRING)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql("INSERT INTO graftc.lake.calls VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graftc.lake.calls VALUES (3, 'a')")
    spark.sql("INSERT INTO graftc.lake.calls VALUES (4, 'b')")
    val tdir = s"$wh/lake/calls"
    assert(IcebergTable.load(tdir).manifests().count(_.content == 0) == 3)

    val msg = spark.sql(
      "CALL graftc.system.rewrite_manifests(`table` => 'lake.calls', target_entries => 1000)")
      .as[String].head()
    assert(msg.contains("packed 3 manifests into 1"))
    assert(IcebergTable.load(tdir).manifests().count(_.content == 0) == 1)

    // analyze persists NDV properties
    val amsg = spark.sql("CALL graftc.system.analyze('lake.calls')").as[String].head()
    assert(amsg.contains("analyzed"))
    assert(graft.ops.Stats.storedNdv(IcebergTable.load(tdir)).get("grp").contains(2L))

    // create_tag + the refs metadata table
    spark.sql("CALL graftc.system.create_tag('lake.calls', 'audit')").collect()
    val refRows = spark.sql(
      "SELECT name, type, snapshot_id FROM graftc.lake.`calls$refs` ORDER BY name")
      .as[(String, String, Long)].collect().toSeq
    assert(refRows.map(r => (r._1, r._2)) == Seq(("audit", "tag"), ("main", "branch")))

    // rollback by positional args
    val firstSnap = IcebergTable.load(tdir).metadata.snapshots.head.snapshotId
    spark.sql(s"CALL graftc.system.rollback('lake.calls', $firstSnap)").collect()
    assert(IcebergTable.load(tdir).metadata.currentSnapshotId.contains(firstSnap))
    assert(spark.sql("SELECT count(*) FROM graftc.lake.calls").as[Long].head() == 2L)
  }

  test("CALL vacuum runs the composite upkeep pass") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftc.lake")
    spark.sql("CREATE TABLE graftc.lake.vac (id BIGINT)")
    spark.sql("INSERT INTO graftc.lake.vac VALUES (1), (2)")
    spark.sql("INSERT INTO graftc.lake.vac VALUES (3)")
    import spark.implicits._
    val msg = spark.sql(
      s"CALL graftc.system.vacuum('lake.vac', ${System.currentTimeMillis() + 1000})")
      .as[String].head()
    assert(msg.contains("expired 1 snapshots"))
    assert(spark.sql("SELECT count(*) FROM graftc.lake.vac").as[Long].head() == 3L)
  }

  test("CALL create_changelog_view exposes row-level CDC to plain SQL") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftc.lake")
    spark.sql("CREATE TABLE graftc.lake.cdcv (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graftc.lake.cdcv VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graftc.lake.cdcv VALUES (3, 'c')")
    spark.sql("DELETE FROM graftc.lake.cdcv WHERE id = 1")
    val snaps = IcebergTable.load(s"$wh/lake/cdcv").metadata.snapshots
    val (s0, s3) = (snaps.head.snapshotId, snaps.last.snapshotId)

    val msg = spark.sql(
      s"CALL graftc.system.create_changelog_view('lake.cdcv', $s0, $s3)")
      .as[String].head()
    assert(msg.contains("lake_cdcv_changes"))
    val ch = spark.sql(
      """SELECT id, v, _change_type FROM lake_cdcv_changes
        |ORDER BY _commit_snapshot_id, _change_type, id""".stripMargin)
      .as[(Long, String, String)].collect().toSeq
    // append of 3 → insert; CoW delete of 1 → its file's rows as
    // delete + surviving row re-inserted (coarse CoW changelog)
    assert(ch.contains((3L, "c", "insert")))
    assert(ch.contains((1L, "a", "delete")))
    assert(!ch.contains((1L, "a", "insert")) ||
      ch.count(_ == ((1L, "a", "delete"))) >= ch.count(_ == ((1L, "a", "insert"))))

    // named view variant
    spark.sql(
      s"""CALL graftc.system.create_changelog_view('lake.cdcv', $s0, $s3,
         |view_name => 'myview')""".stripMargin).collect()
    assert(spark.sql("SELECT count(*) FROM myview").as[Long].head() ==
      ch.size.toLong)
  }

  test("CALL cherrypick_snapshot publishes a staged WAP append") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftc.lake")
    spark.sql("CREATE TABLE graftc.lake.wap (id BIGINT)")
    spark.sql("INSERT INTO graftc.lake.wap VALUES (1), (2)")
    import spark.implicits._
    val e = new graft.api.Engine(spark, wh)
    val staged = e.appendStaged("lake.wap", Seq(3L).toDF("id"), wapId = "w1")
    assert(spark.sql("SELECT count(*) FROM graftc.lake.wap").as[Long].head() == 2L)
    val msg = spark.sql(
      s"CALL graftc.system.cherrypick_snapshot('lake.wap', ${staged.snapshotId})")
      .as[String].head()
    assert(msg.contains("fast-forwarded"))
    assert(spark.sql("SELECT count(*) FROM graftc.lake.wap").as[Long].head() == 3L)
  }

  test("CALL register_table / add_files / migrate_field_ids: the " +
      "adoption lifecycle end to end through SQL") {
    val wh = warehouse
    import spark.implicits._
    val srcA = Files.createTempDirectory("graft-proc-regA").toString
    val srcB = Files.createTempDirectory("graft-proc-regB").toString
    (1L to 30L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcA)
    (31L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcB)

    val reg = spark.sql(
      s"CALL graftc.system.register_table('lake.adopted', '$srcA')")
      .as[String].head()
    assert(reg.contains("30 rows"))
    val add = spark.sql(
      s"CALL graftc.system.add_files('lake.adopted', '$srcB')")
      .as[String].head()
    assert(add.contains("10 rows"))
    assert(spark.sql("SELECT count(*) FROM graftc.lake.adopted")
      .as[Long].head() == 40L)

    val mig = spark.sql(
      "CALL graftc.system.migrate_field_ids('lake.adopted')").as[String].head()
    assert(mig.contains("rename"))
    // the payoff through the SQL surface: rename, then the pre-rename
    // generations still serve their data by field id
    spark.sql("ALTER TABLE graftc.lake.adopted RENAME COLUMN v TO name")
    val n = spark.sql(
      "SELECT count(*) FROM graftc.lake.adopted WHERE name IS NOT NULL")
      .as[Long].head()
    assert(n == 40L)
  }

  test("CALL register_table on a HIVE-LAYOUT directory: the partition " +
      "column serves through plain SQL (metadata fill), WHERE prunes, " +
      "and migrate_field_ids brings back the vectorized scan") {
    val wh = warehouse
    import spark.implicits._
    val src = Files.createTempDirectory("graft-proc-hive").toString
    (1L to 40L).map(i => (i, s"v$i", if (i % 2 == 0) "x" else "y"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(src)
    spark.sql(s"CALL graftc.system.register_table('lake.hivet', '$src')")
      .collect()
    // the path column is ABSENT from the adopted files — SQL reads must
    // fill it from the manifests, not return nulls
    assert(spark.sql(
      "SELECT count(*) FROM graftc.lake.hivet WHERE p = 'x'")
      .as[Long].head() == 20L)
    assert(spark.sql(
      "SELECT count(*) FROM graftc.lake.hivet WHERE p IS NULL")
      .as[Long].head() == 0L)
    // migration materializes the column; SQL keeps answering the same
    spark.sql("CALL graftc.system.migrate_field_ids('lake.hivet')").collect()
    assert(spark.sql(
      "SELECT count(*) FROM graftc.lake.hivet WHERE p = 'y'")
      .as[Long].head() == 20L)
  }

  test("unknown procedure fails with the known list") {
    val wh = warehouse
    val err = intercept[Exception] {
      spark.sql("CALL graftc.system.no_such_proc('x')").collect()
    }
    assert(err.getMessage.contains("unknown procedure") ||
      Option(err.getCause).exists(_.getMessage.contains("unknown procedure")))
  }
}
