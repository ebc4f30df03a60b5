package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scratch profiler for the minhash pipeline stages. */
object Probe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    spark.range(100).count()

    val toks = docs.select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(toks) - 3), " +
        "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")).as("shingle"))
    t("shingles")(sh.count())
    val hashed = sh.select(col("doc_id"),
      xxhash64(col("shingle")).bitwiseAND(0x7FFFFFFFL).as("h")).distinct()
    t("hashed distinct")(hashed.count())
    val mersenne = 2147483647L
    val perms = (0 until 16).map(j => (j, 2L * j + 1L, (j * 2654435761L + 104729L) % mersenne))
    val permDf = spark.createDataFrame(perms).toDF("j", "pa", "pb")
    val mins = hashed.crossJoin(broadcast(permDf))
      .withColumn("ph", col("pa") * col("h") + col("pb"))
      .groupBy("doc_id", "j").agg(min(col("ph")).as("mh"))
    t("minhash sigs")(mins.count())
    val sigs = mins.withColumn("band", (col("j") / lit(4)).cast("int"))
      .groupBy("doc_id", "band")
      .agg(hash(sort_array(collect_list(col("mh")))).as("band_sig"))
    t("band sigs")(sigs.count())
    t("bucket sizes top")(sigs.groupBy("band", "band_sig").count()
      .orderBy(desc("count")).limit(10).collect().map { r =>
        println("  bucket " + r.mkString(",")); 1L
      }.sum)
    val a = sigs.select(col("doc_id").as("a_id"), col("band"), col("band_sig"))
    val b = sigs.select(col("doc_id").as("b_id"), col("band"), col("band_sig"))
    val pairs = a.join(b, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    t("candidate pairs")(pairs.count())
    spark.stop()
  }
}
