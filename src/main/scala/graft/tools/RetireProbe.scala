package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe: stage timings of the q_components_retire body. */
object RetireProbe {
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
      println(f"[ret] $l%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { run =>
      println(s"[ret] === run $run ===")
      val docs = graft.Tables.documents(spark, d)
      val pairs = timed("pairs") {
        graft.ops.Dedup.minhashCandidates(spark, docs).localCheckpoint() }
      val wh = java.nio.file.Files.createTempDirectory("ret_probe").toString
      val e = new graft.api.Engine(spark, wh)
      val idx = new graft.ops.ComponentIndex(e, "q.retire_comps")
      timed("create") { idx.create() }
      timed("bootstrap") { idx.bootstrap(pairs) }
      val gone = (c: org.apache.spark.sql.Column) => c % 101 === 0
      val retired = pairs.select(col("a_id").as("doc_id"))
        .union(pairs.select(col("b_id").as("doc_id")))
        .filter(gone(col("doc_id"))).distinct()
      timed("retire") {
        idx.retire(retired, ids =>
          pairs
            .join(ids.select(col("doc_id").as("a_id")), Seq("a_id"), "left_semi")
            .join(ids.select(col("doc_id").as("b_id")), Seq("b_id"), "left_semi")
            .filter(!gone(col("a_id")) && !gone(col("b_id"))),
          inMaxIds = 0) }
      timed("final-read") {
        val a = idx.assignments.localCheckpoint()
        a.unionByName(a.select(col("component").as("doc_id"),
            col("component")).distinct())
          .groupBy("component")
          .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_doc"))
          .orderBy("component").count() }
    }
    spark.stop()
  }
}
