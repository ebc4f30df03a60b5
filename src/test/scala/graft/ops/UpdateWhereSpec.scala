package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.api.Engine
import graft.meta.IcebergTable

/** Copy-on-write row-level UPDATE: only matching files rewritten, all
  * assignment right-hand sides see original values, non-matching rows
  * byte-identical, prior snapshot time-travelable. */
class UpdateWhereSpec extends SparkSpec {

  import spark.implicits._

  test("updateWhere rewrites matching files only, with simultaneous assignments") {
    val wh = Files.createTempDirectory("graft-upd-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    engine.createTable("lake.acct", StructType(Seq(
      StructField("id", LongType), StructField("a", LongType),
      StructField("b", LongType), StructField("region", StringType))),
      partitionDecls = Seq("region"))
    engine.append("lake.acct", Seq(
      (1L, 10L, 100L, "emea"), (2L, 20L, 200L, "emea"),
      (3L, 30L, 300L, "apac")).toDF("id", "a", "b", "region"))

    // swap a and b on the matching row: both RHS must see ORIGINAL values
    val res = engine.updateWhere("lake.acct", col("id") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    assert(res.nonEmpty)

    val t = IcebergTable.load(s"$wh/lake/acct")
    val rows = ScanPlanner.readTable(spark, t)
      .select("id", "a", "b").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(rows == Seq((1L, 100L, 10L), (2L, 20L, 200L), (3L, 30L, 300L)))

    // the apac file held no matches and was not rewritten; logical
    // update is stamped overwrite (CDC-visible), not replace
    assert(t.metadata.snapshots.last.operation == "overwrite")
    val apacAdded = t.files().filter(_.partition.get("region").contains("apac"))
      .map(_.snapshotId).distinct
    assert(apacAdded == Seq(t.metadata.snapshots.head.snapshotId))

    // nothing-matches → no commit; pre-update snapshot time-travels
    assert(engine.updateWhere("lake.acct", col("id") === 99L,
      Map("a" -> lit(0L))).isEmpty)
    val prev = t.metadata.snapshots.init.last.snapshotId
    val old = ScanPlanner.readTable(spark, t, Some(prev))
      .filter(col("id") === 1L).select("a").as[Long].head()
    assert(old == 10L)
  }
}
