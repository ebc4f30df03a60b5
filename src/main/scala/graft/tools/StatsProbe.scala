package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway empirical probe round 2: ±0.0 floats without NaN, very long
  * string bounds (footer truncation threshold), and whether Spark's
  * min/max agg agrees. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("stats_probe2").toString
    val huge = "zz" + ("x" * 5000) // max-valued huge string
    val huge2 = "a" * 70 // 70 chars, above 64-byte truncate candidates
    val rows = Seq(
      (1, -0.0f, -0.0d, huge2),
      (2, 0.0f, 0.0d, huge),
      (3, 1.5f, 2.5d, "zz")
    ).toDF("i", "f", "d", "s")
    rows.coalesce(1).write.mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir)
    val row = df.agg(
      min("f"), max("f"), min("d"), max("d"), min("s"), max("s")).collect()(0)
    println("=== SPARK AGG ===")
    println(s"f: min=${row.get(0)} max=${row.get(1)}  (bits min=${java.lang.Float.floatToRawIntBits(row.getFloat(0))})")
    println(s"d: min=${row.get(2)} max=${row.get(3)}  (bits min=${java.lang.Double.doubleToRawLongBits(row.getDouble(2))})")
    println(s"s: min=${row.get(4)} max=${String.valueOf(row.get(5)).take(20)}...(len=${String.valueOf(row.get(5)).length})")

    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val file = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file.toString), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in,
      org.apache.parquet.HadoopReadOptions.builder(conf, in.getPath).build())
    println("=== FOOTER ===")
    r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
      .groupBy(_.getPath.toDotString).toSeq.sortBy(_._1).foreach { case (p, chunks) =>
        val st = chunks.head.getStatistics
        def render(b: Any): String = b match {
          case bin: org.apache.parquet.io.api.Binary =>
            val s = bin.toStringUsingUTF8
            s"'${s.take(25)}...'(len=${s.length})"
          case fl: java.lang.Float => s"$fl(bits=${java.lang.Float.floatToRawIntBits(fl)})"
          case db: java.lang.Double => s"$db(bits=${java.lang.Double.doubleToRawLongBits(db)})"
          case x => String.valueOf(x)
        }
        println(f"$p%-4s " +
          (if (st == null || st.isEmpty) "STATS-EMPTY"
           else s"hasMinMax=${st.hasNonNullValue} " +
             (if (st.hasNonNullValue) s"min=${render(st.genericGetMin)} max=${render(st.genericGetMax)}" else "")))
      }
    r.close()
    spark.stop()
  }
}
