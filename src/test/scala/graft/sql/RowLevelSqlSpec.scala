package graft.sql

import java.nio.file.Files

import graft.SparkSpec
import graft.meta.IcebergTable

/** SQL `UPDATE` and `MERGE INTO` through the DSv2 row-level operation
  * surface ([[GraftRowLevelOperation]]): Spark rewrites the commands into
  * group-based copy-on-write `ReplaceData` plans, the executor-side
  * parquet fanout writer rewrites only the scanned files, and the commit
  * is a replace snapshot — prior versions stay readable. */
class RowLevelSqlSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-rls-wh").toString
    spark.conf.set("spark.sql.catalog.graftr", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftr.warehouse", dir)
    dir
  }

  import spark.implicits._

  private def freshOrders(name: String): String = {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftr.lake")
    spark.sql(s"DROP TABLE IF EXISTS graftr.lake.$name")
    spark.sql(
      s"""CREATE TABLE graftr.lake.$name
         |  (order_id BIGINT, region STRING, amount DOUBLE)
         |PARTITIONED BY (region)""".stripMargin)
    spark.sql(
      s"""INSERT INTO graftr.lake.$name VALUES
         |  (1, 'emea', 10.0), (2, 'emea', 20.0),
         |  (3, 'apac', 30.0), (4, 'apac', 40.0), (5, 'amer', 50.0)""".stripMargin)
    s"$wh/lake/$name"
  }

  test("SQL UPDATE rewrites only the files holding matching rows") {
    val dir = freshOrders("upd")
    val before = IcebergTable.load(dir)
    val emeaFiles = before.files().filter(_.partition.get("region").contains("emea"))
      .map(_.filePath).toSet
    val otherFiles = before.files().map(_.filePath).toSet -- emeaFiles
    assert(emeaFiles.nonEmpty && otherFiles.nonEmpty)
    val preSnap = before.metadata.currentSnapshotId.get

    spark.sql("UPDATE graftr.lake.upd SET amount = amount + 1.0 WHERE region = 'emea'")

    val got = spark.sql(
      "SELECT order_id, amount FROM graftr.lake.upd ORDER BY order_id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 11.0), (2L, 21.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))

    // copy-on-write surgical rewrite: non-matching partitions' files survive
    val after = IcebergTable.load(dir)
    val liveNow = after.files().map(_.filePath).toSet
    assert(otherFiles.subsetOf(liveNow), "untouched partition files were rewritten")
    assert(emeaFiles.intersect(liveNow).isEmpty, "matching files were not replaced")
    // rewritten files keep their partition value (pruning still works)
    assert(after.files().forall(_.partition.get("region").nonEmpty))
    // clustered write distribution: ONE rewritten file per partition value
    assert(after.files().count(_.partition.get("region").contains("emea")) == 1)

    // time travel still shows the pre-update rows
    val old = spark.sql(
      s"SELECT amount FROM graftr.lake.upd VERSION AS OF $preSnap WHERE order_id = 1")
      .as[Double].collect().toSeq
    assert(old == Seq(10.0))
  }

  test("UPDATE on the partition column moves rows to the new partition") {
    val dir = freshOrders("updpart")
    spark.sql("UPDATE graftr.lake.updpart SET region = 'emea' WHERE order_id = 3")
    val got = spark.sql(
      "SELECT region FROM graftr.lake.updpart WHERE order_id = 3")
      .as[String].collect().toSeq
    assert(got == Seq("emea"))
    val after = IcebergTable.load(dir)
    val byPart = after.files().flatMap(e =>
      e.partition.get("region").map(_ -> e.recordCount))
    assert(byPart.filter(_._1 == "apac").map(_._2).sum == 1,
      "apac should hold only order 4 after the move")
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    val dir = freshOrders("mrg")
    Seq((1L, 99.0, "upd"), (4L, 0.0, "del"), (7L, 70.0, "ins"), (8L, 80.0, "ins"))
      .toDF("id", "amt", "action").createOrReplaceTempView("changes")

    spark.sql(
      """MERGE INTO graftr.lake.mrg t USING changes c ON t.order_id = c.id
        |WHEN MATCHED AND c.action = 'del' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET amount = c.amt
        |WHEN NOT MATCHED THEN INSERT (order_id, region, amount)
        |  VALUES (c.id, 'apac', c.amt)""".stripMargin)

    val got = spark.sql(
      "SELECT order_id, amount FROM graftr.lake.mrg ORDER BY order_id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 99.0), (2L, 20.0), (3L, 30.0),
      (5L, 50.0), (7L, 70.0), (8L, 80.0)))

    // inserted rows landed in their declared partition with real metadata
    val after = IcebergTable.load(dir)
    assert(spark.sql("SELECT count(*) FROM graftr.lake.mrg WHERE region = 'apac'")
      .as[Long].head() == 3L) // 3 (kept), 7, 8
    assert(after.files().forall(_.partition.get("region").nonEmpty))
    assert(after.metadata.snapshots.last.summary.get("sql-command").nonEmpty)
  }

  test("MERGE INTO with NOT MATCHED BY SOURCE deletes unreferenced rows") {
    val dir = freshOrders("mrgsrc")
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("keep_ids")
    spark.sql(
      """MERGE INTO graftr.lake.mrgsrc t USING keep_ids k ON t.order_id = k.id
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = spark.sql("SELECT order_id FROM graftr.lake.mrgsrc ORDER BY order_id")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
    // prior snapshot still holds all five rows
    val snaps = IcebergTable.load(dir).metadata.snapshots
    val prior = spark.sql(
      s"SELECT count(*) FROM graftr.lake.mrgsrc VERSION AS OF ${snaps.head.snapshotId}")
      .collect()(0).getLong(0)
    assert(prior == 5L)
  }

  test("MERGE INTO with only NOT MATCHED inserts appends without rewriting") {
    val dir = freshOrders("mrgins")
    val before = IcebergTable.load(dir).files().map(_.filePath).toSet
    Seq((20L, 200.0), (21L, 210.0)).toDF("id", "amt")
      .createOrReplaceTempView("newrows")
    spark.sql(
      """MERGE INTO graftr.lake.mrgins t USING newrows n ON t.order_id = n.id
        |WHEN NOT MATCHED THEN INSERT (order_id, region, amount)
        |  VALUES (n.id, 'emea', n.amt)""".stripMargin)
    val liveNow = IcebergTable.load(dir).files().map(_.filePath).toSet
    assert(before.subsetOf(liveNow), "insert-only merge must not rewrite files")
    assert(spark.sql("SELECT count(*) FROM graftr.lake.mrgins").as[Long].head() == 7L)
  }

  test("row-level SQL ops refuse delete-carrying tables with a clear error") {
    val dir = freshOrders("mor")
    // engine-level MoR delete puts the table in delete-carrying state
    graft.meta.TableWriter.deleteWhere(
      spark, dir, org.apache.spark.sql.functions.col("order_id") === 5L)
    assert(IcebergTable.load(dir).deleteFiles().nonEmpty)
    val err = intercept[Exception] {
      spark.sql("UPDATE graftr.lake.mor SET amount = 0.0 WHERE order_id = 1")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m => m != null && m.contains("compact")),
      s"expected compaction hint, got: ${err.getMessage}")
  }
}
