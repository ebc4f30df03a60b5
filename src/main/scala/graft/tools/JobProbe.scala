package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object JobProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed(l: String, n: Int)(b: => Unit): Unit = {
      (1 to 2).foreach(_ => b) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => b)
      println(f"[job] $l%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }
    timed("range.count (no shuffle)", 20) { spark.range(1000).count(); () }
    timed("range.agg.collect (1 shuffle)", 20) {
      spark.range(1000).groupBy(($"id" % 10).as("k")).count().collect(); () }
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    timed("localCheckpoint(eager)", 20) { df.localCheckpoint(); () }
    timed("2k-row shuffle + checkpoint", 10) {
      df.repartition($"id").localCheckpoint(); () }
    timed("tiny parquet write", 10) {
      val d = java.nio.file.Files.createTempDirectory("jp").toString
      df.coalesce(1).write.mode("overwrite").parquet(d); () }
    timed("isEmpty on checkpointed", 20) {
      val c = df.localCheckpoint(); c.isEmpty; () }
    spark.stop()
  }
}
