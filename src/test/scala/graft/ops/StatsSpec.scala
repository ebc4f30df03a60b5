package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.FixtureWriter
import graft.meta.IcebergTable

/** KMV NDV sketches + ANALYZE TABLE: estimator sanity, property
  * persistence, and the DSv2 scan surfacing distinctCount to Catalyst. */
class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("kmvSketch is exact below k and within 15% above k") {
    val df = spark.range(0, 5000)
      .select(col("id"), (col("id") % 37).as("small"),
        concat(lit("u"), col("id") % 1200).as("mid"))
    val sk = Stats.kmvSketch(df, Seq("id", "mid", "small"), k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sk("small") == 37L) // < k: exact
    val midErr = math.abs(sk("mid") - 1200.0) / 1200.0
    val idErr = math.abs(sk("id") - 5000.0) / 5000.0
    assert(midErr < 0.15, s"mid estimate ${sk("mid")} off by $midErr")
    assert(idErr < 0.15, s"id estimate ${sk("id")} off by $idErr")
  }

  test("analyzeTable persists NDV properties and the scan reports distinctCount") {
    val wh = Files.createTempDirectory("graft-stats-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val tdir = s"$wh/sales/orders"

    val res = Stats.analyzeTable(spark, tdir, k = 512)
    assert(res.ndv.keySet.contains("region") && res.ndv.keySet.contains("order_id"))
    val exactRegions = ScanPlanner.readTable(spark, IcebergTable.load(tdir))
      .select("region").distinct().count()
    assert(res.ndv("region") == exactRegions) // < k: sketch is exact

    val t = IcebergTable.load(tdir)
    assert(Stats.storedNdv(t)("region") == exactRegions)
    assert(t.metadata.properties.contains("graft.stats.analyzed-snapshot"))

    // the DSv2 scan hands the estimate to Catalyst
    val b = new graft.sql.GraftScanBuilder(t, ScanPlanner.currentSparkSchema(t).get)
    val scan = b.build().asInstanceOf[graft.sql.GraftFileScan]
    val cstats = scan.estimateStatistics().columnStats()
    var found = false
    cstats.forEach { (ref, cs) =>
      if (ref.describe() == "region") {
        found = true
        assert(cs.distinctCount().getAsLong == exactRegions)
        assert(cs.nullCount().isPresent)
      }
    }
    assert(found, "region column stats missing")
  }
}
