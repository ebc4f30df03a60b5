package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe: stage timings of the q_components_semantic body. */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def timed[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[sem] $l%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { run =>
      println(s"[sem] === run $run ===")
      val emb = graft.Tables.embeddings(spark, d)
      val isBatch = (c: org.apache.spark.sql.Column) => c % 5 === 0
      val wh = java.nio.file.Files.createTempDirectory("sem_probe").toString
      val e = new graft.api.Engine(spark, wh)
      val idx = new graft.ops.AnnIndex(e, "q.sem_idx", kClusters = 4, iters = 2)
      timed("create") { idx.create() }
      timed("bootstrap") { idx.bootstrap(emb.filter(!isBatch(col("vec_id")))) }
      val comps = new graft.ops.ComponentIndex(e, "q.sem_comps")
      timed("comps.create") { comps.create() }
      timed("admitIfNovel") {
        idx.admitIfNovel(emb.filter(isBatch(col("vec_id"))), 0.35,
          components = Some(comps)) }
      timed("final-read") {
        val a = comps.assignments.localCheckpoint()
        a.unionByName(a.select(col("component").as("doc_id"),
            col("component")).distinct())
          .groupBy("component")
          .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_doc"))
          .orderBy("component").count() }
    }
    spark.stop()
  }
}
