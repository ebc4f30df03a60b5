package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.{IcebergTable, TableCreator, TableWriter}
import graft.rel.MetaRelations

/** Z-order clustering: interleave correctness, and the layout payoff —
  * after [[Compact.rewriteClustered]] a range predicate on EITHER
  * clustered dimension prunes most files via their min/max bounds,
  * while the table content is byte-identical. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("interleave puts bit j of dim i at position j*k+i") {
    // x = 0b0101 (5), y = 0b0011 (3), 4 bits: even positions take x's
    // bits (1,0,1,0 -> pos 0,4), odd take y's (1,1 -> pos 1,3)
    // -> z = 0b011011 = 27
    val df = Seq((5L, 3L)).toDF("bx", "by")
    val z = df.select(
      ZOrder.interleave(Seq(col("bx"), col("by")), 4).as("z"))
      .as[Long].head()
    val expected = (0 until 4).map { j =>
      (((5L >> j) & 1L) << (2 * j)) | (((3L >> j) & 1L) << (2 * j + 1))
    }.reduce(_ | _)
    assert(z == expected && z == 27L)
  }

  test("binCol is clamped pure-integer equi-width binning") {
    val df = Seq(0L, 10L, 99L, 100L).toDF("v")
    val got = df.select(
      ZOrder.binCol(col("v"), lit(0L), lit(99L), 2).as("b"))
      .as[Long].collect().toSeq
    // nbins=4 over [0,99]: (v*4) div 100 -> 0,0,3, clamp(4)=3
    assert(got == Seq(0L, 0L, 3L, 3L))
  }

  test("rewriteClustered tightens per-file bounds on BOTH dims and preserves content") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/t"
    TableCreator.create(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.LongType))))
    // 10k rows on a 100x100 grid, written in 8 arbitrary chunks: every
    // file's x and y bounds span nearly the full range
    val df = spark.range(0, 10000)
      .select((col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"))
      .repartition(8)
    TableWriter.append(spark, dir, df)

    val before = IcebergTable.load(dir)
    val filesBefore = MetaRelations.files(spark, before)
    val keptBefore = ScanPlanner.pruneFiles(
      spark, before, filesBefore, "x", Some(0.0), Some(9.0)).count()
    assert(keptBefore == before.files().size.toLong,
      "pre-clustering every file spans x: nothing prunes")

    val res = Compact.rewriteClustered(spark, dir, Seq("x", "y"),
      bits = 4, targetFiles = Some(16))
    assert(res.nonEmpty)

    val after = IcebergTable.load(dir)
    assert(after.files().size > 4, "rewrite should produce many z-region files")
    val filesAfter = MetaRelations.files(spark, after)
    val keptX = ScanPlanner.pruneFiles(
      spark, after, filesAfter, "x", Some(0.0), Some(9.0)).count()
    val keptY = ScanPlanner.pruneFiles(
      spark, after, filesAfter, "y", Some(0.0), Some(9.0)).count()
    assert(keptX < after.files().size / 2,
      s"x-range should prune most files (kept $keptX of ${after.files().size})")
    assert(keptY < after.files().size / 2,
      s"y-range should prune most files (kept $keptY of ${after.files().size})")

    // content unchanged, and time travel to the pre-rewrite snapshot works
    val got = ScanPlanner.readTable(spark, after)
      .as[(Long, Long)].collect().sorted.toSeq
    val want = (0 until 10000).map(i => ((i % 100).toLong, (i / 100).toLong)).sorted
    assert(got == want)
    val prevSnap = after.metadata.snapshots.init.last.snapshotId
    assert(ScanPlanner.readTable(spark, after, Some(prevSnap)).count() == 10000L)
  }

  test("z-order on an all-NULL column is rejected with a clear error") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = Files.createTempDirectory("graft-znull").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("x", LongType), StructField("dead", StringType))))
    TableWriter.append(spark, dir,
      Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
        .toDF("x", "dead"))
    val err = intercept[IllegalArgumentException] {
      Compact.rewriteClustered(spark, dir, Seq("x", "dead"))
    }
    assert(err.getMessage.contains("dead"))
    // the table is untouched — no partial rewrite committed
    assert(IcebergTable.load(dir).metadata.snapshots.size == 1)
  }
}
