package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Sessions
import graft.meta.IcebergTable
import graft.ops.MetaHealth
import graft.rel.MetaRelations

/** Scratch profiler for the health task's stages on the monster table. */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft-monster"
    spark.range(1000).count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val tb = t("load-metadata")(IcebergTable.load(dir))
      val entries = t("parse-manifests")(tb.files(None))
      println(s"[probe] entries=${entries.size}")
      val files = t("createDataFrame")(MetaRelations.files(spark, tb).coalesce(1))
      val cached = t("cache+count")({ val c = files.cache(); c.count(); c })
      val h = t("build-report")(MetaHealth.report(spark, tb, cached))
      t("fileStats")(h.fileStats.collect())
      t("manifestCensus")(h.manifestCensus.collect())
      t("partitionStats")(h.partitionStats.collect())
      t("nullRates")(h.nullRates.collect())
      t("columnShare")(h.columnShare.collect())
      t("columnBounds")(h.columnBounds.collect())
      t("overlap")(h.overlap.collect())
      cached.unpersist()
    }
    spark.stop()
  }
}
