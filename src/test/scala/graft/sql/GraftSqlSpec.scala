package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, IsNotNull}

import graft.SparkSpec
import graft.fixtures.FixtureWriter
import graft.meta.{IcebergTable, TableWriter}
import graft.ops.ScanPlanner

/** The DSv2 SQL catalog: `SELECT ... FROM graft.ns.table` resolves
  * through [[GraftCatalog]] with metadata file pruning on pushed filters,
  * Spark's own vectorized parquet scan underneath, snapshot time travel
  * via `VERSION AS OF`, and a merge-on-read V1Scan fallback for
  * delete-carrying tables (a bare file scan would resurrect rows). */
class GraftSqlSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-sql-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", dir)
    dir
  }

  import spark.implicits._

  test("SELECT through the catalog equals the planner read; SHOW TABLES works") {
    val wh = warehouse // materialize the fixture + catalog conf FIRST
    val viaSql = spark.sql(
      "SELECT order_id, region, amount FROM graft.sales.orders")
    val viaPlanner = ScanPlanner
      .readTable(spark, IcebergTable.load(s"$wh/sales/orders"))
      .select("order_id", "region", "amount")
    assert(viaSql.count() == viaPlanner.count())
    assert(viaSql.as[(Long, String, Double)].collect().toSet ==
      viaPlanner.as[(Long, String, Double)].collect().toSet)

    val shown = spark.sql("SHOW TABLES IN graft.sales")
      .select("tableName").as[String].collect().toSet
    assert(shown.contains("orders"))
  }

  test("aggregation + filter over the catalog match SQL on the raw planner read") {
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse) // force init
    val got = spark.sql(
      """SELECT region, count(*) AS n, sum(amount) AS amt
        |FROM graft.sales.orders WHERE amount > 50.0
        |GROUP BY region ORDER BY region""".stripMargin)
    val want = ScanPlanner
      .readTable(spark, IcebergTable.load(s"$warehouse/sales/orders"))
      .filter(col("amount") > 50.0)
      .groupBy("region").agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      .orderBy("region")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("pushed equality filter prunes the file list to the matching partition") {
    val t = IcebergTable.load(s"$warehouse/sales/orders")
    val live = t.files(None)
    val regions = live.flatMap(_.partition.get("region")).distinct
    assert(regions.size >= 2, "fixture should be region-partitioned")
    val target = regions.head

    val b = new GraftScanBuilder(t, ScanPlanner.currentSparkSchema(t).get)
    b.pushFilters(Array(IsNotNull("region"), EqualTo("region", target)))
    val scan = b.build().asInstanceOf[GraftFileScan]
    val kept = scan.currentEntries.size
    val expected = live.count(e => e.partition.get("region").forall(_ == target))
    assert(kept == expected && kept < live.size)

    // bounds prune: order_id beyond every upper bound keeps nothing
    val b2 = new GraftScanBuilder(t, ScanPlanner.currentSparkSchema(t).get)
    b2.pushFilters(Array(GreaterThan("order_id", Long.box(999999L))))
    val scan2 = b2.build().asInstanceOf[GraftFileScan]
    assert(scan2.currentEntries.isEmpty)
  }

  test("VERSION AS OF reads the pinned snapshot; bad version fails clearly") {
    val t = IcebergTable.load(s"$warehouse/sales/orders")
    val first = t.metadata.snapshots.minBy(_.sequenceNumber)
    val atFirst = spark.sql(
      s"SELECT count(*) AS n FROM graft.sales.orders VERSION AS OF '${first.snapshotId}'")
      .as[Long].head()
    val now = spark.sql("SELECT count(*) AS n FROM graft.sales.orders").as[Long].head()
    val wantFirst = ScanPlanner.readTable(spark, t, Some(first.snapshotId)).count()
    assert(atFirst == wantFirst)
    assert(now != atFirst)

    val err = intercept[Exception](spark.sql(
      "SELECT * FROM graft.sales.orders VERSION AS OF '424242'").collect())
    assert(err.getMessage.contains("424242"))
  }

  test("metadata tables are queryable with plain SELECT (t$kind identifiers)") {
    val wh = warehouse
    val t = IcebergTable.load(s"$wh/sales/orders")

    assert(spark.sql("SELECT count(*) AS n FROM graft.sales.`orders$files`")
      .as[Long].head() == t.files().size.toLong)
    val ops = spark.sql(
      "SELECT operation FROM graft.sales.`orders$snapshots` ORDER BY timestamp_ms")
      .as[String].collect().toSeq
    assert(ops == t.metadata.snapshots.sortBy(_.timestampMs).map(_.operation))
    // partitions rollup: per-partition record sums agree with the files scan
    val viaSql = spark.sql(
      """SELECT partition, record_count FROM graft.sales.`orders$partitions`
        |ORDER BY partition""".stripMargin).collect().length
    assert(viaSql == t.files().flatMap(_.partition.values).distinct.size)
    // column pruning + filter compose
    assert(spark.sql(
      """SELECT file_path FROM graft.sales.`orders$files`
        |WHERE record_count > 0""".stripMargin).count() == t.files().size.toLong)
    assert(spark.sql("SELECT count(*) AS n FROM graft.sales.`orders$history`")
      .as[Long].head() >= 1L)
  }

  test("entries / all_files / all_manifests metadata tables") {
    val wh = warehouse
    val t = IcebergTable.load(s"$wh/sales/orders")

    // entries: superset of files (includes delete manifests + tombstones)
    val entries = spark.sql(
      "SELECT status, content, manifest_path FROM graft.sales.`orders$entries`")
      .collect()
    // every live data + delete entry surfaces (this writer rewrites
    // manifest lists rather than writing status=2 tombstones, so with
    // no tombstones present the counts are exactly equal)
    assert(entries.length == t.files().size + t.deleteFiles().size)
    assert(entries.forall(_.getAs[String]("manifest_path").nonEmpty))
    assert(entries.filter(_.getAs[Int]("content") == 0).length ==
      t.files().size)

    // all_files: union over every snapshot — strictly more file paths
    // than the current snapshot (the overwrite dropped older appends)
    val curPaths = t.files().map(_.filePath).toSet
    val allPaths = spark.sql(
      "SELECT DISTINCT file_path FROM graft.sales.`orders$all_files`")
      .as[String].collect().toSet
    assert(curPaths.subsetOf(allPaths))
    assert(allPaths.size > curPaths.size,
      "historical snapshots' files missing from all_files")

    // all_manifests: one row per (snapshot, manifest); every snapshot
    // present, counts match the per-snapshot manifest lists
    val perSnap = spark.sql(
      """SELECT reference_snapshot_id, count(*) AS n
        |FROM graft.sales.`orders$all_manifests`
        |GROUP BY reference_snapshot_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSnap.keySet == t.metadata.snapshots.map(_.snapshotId).toSet)
    t.metadata.snapshots.foreach { s =>
      assert(perSnap(s.snapshotId) ==
        t.manifests(Some(s.snapshotId)).size.toLong)
    }
  }

  test("delete-carrying tables read merge-on-read through SQL (V1Scan fallback)") {
    val wh2 = Files.createTempDirectory("graft-sql-del-wh").toString
    FixtureWriter.writeDemo(spark, wh2)
    val dir = s"$wh2/sales/orders"
    assert(TableWriter.deleteWhere(spark, dir, col("amount") > 100.0).nonEmpty)
    spark.conf.set("spark.sql.catalog.graft_del", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_del.warehouse", wh2)

    val viaSql = spark.sql(
      "SELECT order_id, amount FROM graft_del.sales.orders WHERE amount <= 60.0")
      .as[(Long, Double)].collect().toSet
    val want = ScanPlanner.readTable(spark, IcebergTable.load(dir))
      .filter(col("amount") <= 60.0)
      .select("order_id", "amount").as[(Long, Double)].collect().toSet
    assert(viaSql == want)
    // the deletes really bite: no row above the deleted threshold survives
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_del.sales.orders WHERE amount > 100.0")
      .as[Long].head() == 0L)
  }

  test("adopted-table fallback is SCOPED: vectorized when the pruned set " +
      "holds no adopted file or no fillable column is required") {
    val wh = warehouse
    // hive drop (all files adopted, p lives only in the manifests) plus
    // one NATIVE append that materializes p in-file
    val src = Files.createTempDirectory("sql-hive-src").toString
    Seq((1L, "x", "a"), (2L, "y", "a")).toDF("id", "name", "p")
      .write.mode("overwrite").partitionBy("p").parquet(src)
    val e = new graft.api.Engine(spark, wh)
    e.registerParquet("adopted.scoped", src)
    e.append("adopted.scoped", Seq((3L, "z", "b")).toDF("id", "name", "p"))
    val t = IcebergTable.load(s"$wh/adopted/scoped")
    val schema = ScanPlanner.currentSparkSchema(t).get

    // the path column required + adopted files surviving → wrapped plan
    val bAll = new GraftScanBuilder(t, schema)
    assert(bAll.build().isInstanceOf[GraftMorV1Scan],
      "a full read of an adopted table must take the fill fallback")
    // a projection of file-carried columns only → vectorized scan, even
    // with adopted files live
    val bProj = new GraftScanBuilder(t, schema)
    bProj.pruneColumns(org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == "p")))
    assert(bProj.build().isInstanceOf[GraftFileScan],
      "a projection without fillable columns must stay vectorized")
    // a partition filter pruning to the NATIVE file only → vectorized,
    // path column and all
    val bNat = new GraftScanBuilder(t, schema)
    bNat.pushFilters(Array(IsNotNull("p"), EqualTo("p", "b")))
    assert(bNat.build().isInstanceOf[GraftFileScan],
      "a probe pruned to native files must stay vectorized")

    // and both routes answer identically through SQL
    assert(spark.sql(
      "SELECT id, name FROM graft.adopted.scoped ORDER BY id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y"), (3L, "z")))
    assert(spark.sql(
      "SELECT id, p FROM graft.adopted.scoped WHERE p = 'a' ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "a")))
    assert(spark.sql(
      "SELECT id, p FROM graft.adopted.scoped WHERE p = 'b'")
      .as[(Long, String)].collect().toSeq == Seq((3L, "b")))
  }
}
