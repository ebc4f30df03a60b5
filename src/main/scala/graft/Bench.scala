package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: exercise the scan/agg/join/window code paths once so
    // per-query timings measure steady state, not first-use JIT + codegen
    // compilation of the whole engine.
    {
      import org.apache.spark.sql.functions._
      // collect() (not count()) on the aggregates: count(1) over an agg
      // lets column pruning drop the aggregate input entirely, so the data
      // pages would stay cold and the warmup would warm nothing.
      spark.range(1000).agg(sum(col("id"))).collect()
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.filter(col("l_quantity") > 0).groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice"))).collect()
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_orderkey")
      li.withColumn("rn", row_number().over(w)).count()
      // touch the remaining tables so no timed query pays first-read costs
      // (parquet footers, page-cache fill, column decompression paths)
      spark.read.parquet(s"$sfDir/documents.parquet")
        .agg(sum(length(col("text")))).collect()
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .agg(sum(expr("size(embedding)"))).collect()
      spark.read.parquet(s"$sfDir/events.parquet").agg(max(col("ts"))).collect()
      Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
    }

    // Best-of-2 per query: the box is shared, so a single timing can absorb a
    // transient CPU/IO spike from a concurrent JVM (observed 25x outliers on
    // otherwise-identical binaries). The min of two back-to-back runs is the
    // steady-state cost of the plan, which is what we want to track per round.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val dt = times.min
      System.err.println(f"[bench] $name%-22s $dt%8.2f s  (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
      name -> times
    }
    def jsonMap(f: Seq[Double] => Double): String = results
      .map { case (k, ts) => s"\"" + k + "\":" + f(ts) }.mkString("{", ",", "}")
    // min-of-2 is the steady-state series; first-run is reported alongside
    // so cold-start/codegen regressions stay visible round-over-round
    val total = results.map(_._2.min).sum
    val totalFirst = results.map(_._2.head).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":2,"agg":"min","total_first_run":$totalFirst,"queries":${jsonMap(_.min)},"queries_first_run":${jsonMap(_.head)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
