package graft.tools

import org.apache.spark.sql.SparkSession

/** Box-noise canary: times three cheap untouched queries (min of 3)
  * against their committed quiet-stamp values so a re-stamp can be
  * scheduled in a quiet window. */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    graft.Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val canaries = Seq(
      ("q_scan_project", 0.077), ("q_version_census", 0.119),
      ("q_token_count", 0.125), ("q_text_stats", 0.260),
      ("q_tfidf", 0.429))
    // warm
    canaries.foreach { case (q, _) =>
      graft.queries.Registry.queries(q)(spark, sfDir).count() }
    val ratios = canaries.map { case (q, ref) =>
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.Registry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[canary] $q%-18s $t%6.3f s (quiet ref $ref%6.3f, ${t / ref}%4.2fx)")
      t / ref
    }
    println(f"[canary] median ratio ${ratios.sorted.apply(ratios.size / 2)}%4.2fx")
    spark.stop()
  }
}
