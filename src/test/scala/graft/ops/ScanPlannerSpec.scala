package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** Metadata-pruned data reads: the pruned scan must open fewer files than
  * the full scan while returning exactly the filtered result. */
class ScanPlannerSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-scan-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    dir
  }
  private lazy val engine = new Engine(spark, warehouse)

  import spark.implicits._

  test("readTable returns the live data of the current snapshot") {
    val df = engine.readTable("sales.orders")
    // current snapshot is the overwrite: order_id 1..15
    assert(df.count() == 15L)
    assert(df.agg(min("order_id"), max("order_id")).as[(Long, Long)].head() == (1L, 15L))
    // time travel: the 3rd append snapshot had 60 rows live
    val snaps = engine.load("sales.orders").metadata.snapshots.map(_.snapshotId)
    assert(engine.readTable("sales.orders", Some(snaps(2))).count() == 60L)
  }

  test("bound pruning opens fewer files, same result as full filtered read") {
    val snaps = engine.load("sales.orders").metadata.snapshots.map(_.snapshotId)
    val pin = Some(snaps(2)) // 60 rows across 3 appends × regions
    val full = engine.readTable("sales.orders", pin)
      .filter(col("order_id") >= 46 && col("order_id") <= 60)
    val pruned = engine.readTableWhere("sales.orders", "order_id",
      Some(46.0), Some(60.0), pin)
    // identical result…
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum("order_id")).as[Double].head() ==
      full.agg(sum("order_id")).as[Double].head())
    // …from strictly fewer parquet files (ids 46-60 live only in the 3rd
    // append's files; each append wrote per-region files)
    assert(pruned.inputFiles.length < engine.readTable("sales.orders", pin).inputFiles.length)
  }

  test("partition pruning composes with bound pruning") {
    val snaps = engine.load("sales.orders").metadata.snapshots.map(_.snapshotId)
    val pin = Some(snaps(2))
    val pruned = engine.readTableWhere("sales.orders", "order_id",
      None, None, pin, partitionEquals = Map("region" -> "eu-west"))
    val full = engine.readTable("sales.orders", pin).filter(col("region") === "eu-west")
    assert(pruned.filter(col("region") === "eu-west").count() == full.count())
    assert(pruned.inputFiles.length < engine.readTable("sales.orders", pin).inputFiles.length)
  }

  test("createAllViews makes the warehouse queryable with spark.sql") {
    val names = engine.createAllViews()
    // legacy.inventory is metadata-only (no materialized data) — skipped
    assert(names.toSet.contains("sales_orders") && names.size == 4)
    // plain SQL over the registered views, joins included
    val r = spark.sql(
      """SELECT region, count(*) AS n, round(sum(amount), 2) AS amt
        |FROM sales_orders GROUP BY region ORDER BY region""".stripMargin).collect()
    assert(r.map(_.getAs[Long]("n")).sum == 15L) // current snapshot = overwrite
    assert(spark.sql(
      "SELECT count(*) FROM sales_orders o JOIN sales_customers c " +
        "ON o.order_id = c.customer_id").collect().head.getLong(0) > 0)
  }

  test("a range outside all bounds returns empty without scanning") {
    val df = engine.readTableWhere("sales.orders", "order_id",
      Some(100000.0), Some(200000.0))
    assert(df.count() == 0L)
    assert(df.columns.contains("order_id")) // schema preserved
  }
}
