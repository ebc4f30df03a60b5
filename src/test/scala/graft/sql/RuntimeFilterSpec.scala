package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.connector.expressions.{Expressions, LiteralValue}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.SparkSpec
import graft.fixtures.FixtureWriter
import graft.meta.IcebergTable
import graft.ops.ScanPlanner

/** [[GraftFileScan]]'s cluster-scale capabilities: manifest-exact
  * statistics for join planning and runtime (DPP-style) file pruning. */
class RuntimeFilterSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-rf-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", dir)
    dir
  }

  import spark.implicits._

  private def ordersTable = IcebergTable.load(s"$warehouse/sales/orders")

  private def freshScan(t: IcebergTable): GraftFileScan = {
    val b = new GraftScanBuilder(t, ScanPlanner.currentSparkSchema(t).get)
    b.build().asInstanceOf[GraftFileScan]
  }

  test("estimateStatistics reports exact manifest sums") {
    val wh = warehouse
    val t = ordersTable
    val scan = freshScan(t)
    val stats = scan.estimateStatistics()
    val live = t.files(None)
    assert(stats.numRows().getAsLong == live.map(_.recordCount).sum)
    assert(stats.sizeInBytes().getAsLong == live.map(_.fileSizeInBytes).sum)
    assert(stats.numRows().getAsLong ==
      ScanPlanner.readTable(spark, t).count())
  }

  test("runtime filter() prunes the file list like static pushdown") {
    val t = ordersTable
    val live = t.files(None)
    val regions = live.flatMap(_.partition.get("region")).distinct.sorted
    assert(regions.size >= 2)
    val target = regions.head

    val scan = freshScan(t)
    assert(scan.filterAttributes().map(_.describe()).contains("region"))
    val before = scan.currentEntries.size
    // the predicate shape Spark sends after a DPP subquery: region IN (target)
    val in = new Predicate("IN", Array(
      Expressions.column("region"),
      org.apache.spark.sql.GraftParquetBridge.v2Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(target), StringType)))
    scan.filter(Array(in))
    val after = scan.currentEntries.size
    val expected = live.count(e => e.partition.get("region").forall(_ == target))
    assert(after == expected && after < before)
    // statistics shrink with the pruned list (post-filter replanning sees it)
    assert(scan.estimateStatistics().numRows().getAsLong ==
      scan.currentEntries.map(_.recordCount).sum)
    // and the batch only reads surviving files
    assert(scan.toBatch.planInputPartitions().nonEmpty)
  }

  test("broadcast join on the partition column stays correct with runtime filtering on") {
    val wh = warehouse
    spark.sql("SELECT region FROM graft.sales.orders LIMIT 1").collect() // init catalog
    val dims = Seq(("EU", "Europe")).toDF("r", "label")
    dims.createOrReplaceTempView("dim_regions")
    val got = spark.sql(
      """SELECT o.region, count(*) AS n
        |FROM graft.sales.orders o JOIN dim_regions d ON o.region = d.r
        |GROUP BY o.region ORDER BY o.region""".stripMargin).collect()
    val want = ScanPlanner.readTable(spark, ordersTable)
      .join(dims, col("region") === col("r"))
      .groupBy("region").agg(count(lit(1)).as("n"))
      .orderBy("region").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("a graft table with few rows broadcasts by numRows, not file-size guess") {
    val wh = warehouse
    val t = ordersTable
    val scan = freshScan(t)
    // the planner-visible estimate equals the true row count, which is the
    // quantity autoBroadcastJoinThreshold-style decisions key off
    assert(scan.estimateStatistics().numRows().getAsLong ==
      ScanPlanner.readTable(spark, t).count())
  }
}
