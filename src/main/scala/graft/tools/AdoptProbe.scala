package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe for the adoption verbs (not part of the driver
  * contract): builds the bench's 10k hard-link fixture and times
  * registerParquet runs under GRAFT_ADOPT_DEBUG. */
object AdoptProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val adoptSeedDir = java.nio.file.Files.createTempDirectory("probe_adopt_seed")
    docs.select(col("doc_id"), col("lang")).limit(64).coalesce(1)
      .write.mode("overwrite").parquet(adoptSeedDir.toString)
    val adoptSeed = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(adoptSeedDir)
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    val adoptSrc = java.nio.file.Files.createTempDirectory("probe_adopt_src")
    (0 until n).foreach { i =>
      java.nio.file.Files.createLink(adoptSrc.resolve(f"part-$i%05d.parquet"), adoptSeed)
    }
    (1 to 2).foreach { run =>
      val adoptEngine = new graft.api.Engine(spark,
        java.nio.file.Files.createTempDirectory("probe_adopt_wh").toString)
      val t0 = System.nanoTime()
      adoptEngine.registerParquet("bench.adopt10k", adoptSrc.toString)
      println(f"[probe] run $run d_adopt_${n} total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
