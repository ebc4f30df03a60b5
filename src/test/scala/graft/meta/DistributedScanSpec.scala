package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.FixtureWriter
import graft.rel.MetaRelations

/** Parity + plan-shape of the executor-parallel manifest scan: above
  * [[MetaRelations.DistributeEntriesThreshold]] the `files` relation is
  * built by Avro parses inside `mapPartitions` (no driver row
  * serialization), and must agree row-for-row with the driver-side
  * parse (VERDICT r4 item 3). */
class DistributedScanSpec extends SparkSpec {

  private lazy val tableDir: String = {
    val dir = Files.createTempDirectory("graft-dist-scan").resolve("big").toString
    // 3 commits x 1500 files = 4500 live entries — over the threshold
    FixtureWriter.writeMonster(dir, nCommits = 3, filesPerCommit = 1500)
    dir
  }

  test("distributed files() matches the driver parse exactly") {
    val t = IcebergTable.load(tableDir)
    val driverEntries = t.files()
    assert(driverEntries.size == 4500)

    val df = MetaRelations.files(spark, t)
    // plan shape: entry rows come from MapPartitions (executor-side Avro
    // parse) — the only LocalRelation allowed is the tiny path list
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("MapPartitions"))
    assert(!plan.contains("LocalRelation [file_path"))

    assert(df.count() == driverEntries.size.toLong)
    val agg = df.agg(
      sum("record_count").as("rows"),
      sum("file_size_in_bytes").as("bytes"),
      countDistinct("file_path").as("paths")).collect().head
    assert(agg.getAs[Long]("rows") == driverEntries.map(_.recordCount).sum)
    assert(agg.getAs[Long]("bytes") == driverEntries.map(_.fileSizeInBytes).sum)
    assert(agg.getAs[Long]("paths") == driverEntries.size.toLong)

    // spot-check a full row including the map columns and binary bounds
    val probe = driverEntries.minBy(_.filePath)
    val row = df.filter(col("file_path") === probe.filePath).collect().head
    assert(row.getAs[Long]("record_count") == probe.recordCount)
    assert(row.getAs[Map[String, String]]("partition") == probe.partition)
    assert(row.getAs[Map[Int, Long]]("null_value_counts") == probe.nullValueCounts)
    assert(row.getAs[Map[Int, Array[Byte]]]("lower_bounds")(1)
      .sameElements(probe.lowerBounds(1)))
  }

  test("snapshot pinning works through the distributed path") {
    val t = IcebergTable.load(tableDir)
    val first = t.metadata.snapshots.head.snapshotId
    // snapshot 1: 1500 entries — still driver path; current: distributed
    assert(MetaRelations.files(spark, t, Some(first)).count() == 1500L)
    assert(MetaRelations.files(spark, t, None).count() == 4500L)
  }
}
