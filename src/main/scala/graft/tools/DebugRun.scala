package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Sessions
import graft.queries.Registry

/** Dev helper: run one registered query and show its result + plan.
  * Usage: runMain graft.tools.DebugRun <queryName> [sfDir] [explain]
  */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df =
      if (name == "entry") graft.SparkEntry.entry(spark)
      else Registry.queries(name)(spark, sfDir)
    if (args.length > 2) df.explain("formatted")
    df.show(30, truncate = false)
    spark.stop()
  }
}
