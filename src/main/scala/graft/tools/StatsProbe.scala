package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway empirical probe: what parquet-mr footer statistics record
  * versus the Spark min/max agg the commit stats pass used to run —
  * the evidence base for the footer-derived commit stats
  * (OPTIMIZATION_r18.md change #8). Two fixtures:
  *
  *  1. the type zoo — NaN floats/doubles (parquet drops min/max:
  *     `hasMinMax=false`), lists with null elements / empty / null
  *     arrays (leaf value/null counts equal the engine's agg formulas),
  *     pre-epoch dates (epoch days), micro-precision timestamps
  *     (epoch micros, TIMESTAMP(MICROS, adjusted)), unicode strings;
  *  2. the edge fixture — ±0.0 (PARQUET-1222 adjustment), a >4 KB
  *     string as the max (drops the WHOLE chunk's stats, null count
  *     included).
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.Sessions.required.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def dumpFooter(dir: String): Unit = {
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration()
      val file = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator().asScala.find(_.toString.endsWith(".parquet")).get
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file.toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in,
        org.apache.parquet.HadoopReadOptions.builder(conf, in.getPath).build())
      println("createdBy: " + r.getFooter.getFileMetaData.getCreatedBy)
      println("recordCount: " + r.getRecordCount)
      r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .groupBy(_.getPath.toDotString).toSeq.sortBy(_._1).foreach { case (p, chunks) =>
          val c = chunks.head
          val st = c.getStatistics
          val pt = c.getPrimitiveType
          def render(b: Any): String = b match {
            case bin: org.apache.parquet.io.api.Binary =>
              val s = bin.toStringUsingUTF8
              s"'${s.take(25)}'(len=${s.length})"
            case fl: java.lang.Float =>
              s"$fl(bits=${java.lang.Float.floatToRawIntBits(fl)})"
            case db: java.lang.Double =>
              s"$db(bits=${java.lang.Double.doubleToRawLongBits(db)})"
            case x => String.valueOf(x)
          }
          println(f"$p%-16s prim=${pt.getPrimitiveTypeName}%-8s " +
            f"ann=${Option(pt.getLogicalTypeAnnotation).getOrElse("-")}%-26s " +
            f"vals=${chunks.map(_.getValueCount).sum}%4d " +
            (if (st == null || st.isEmpty) "STATS-EMPTY"
             else f"nullsSet=${st.isNumNullsSet} nulls=${st.getNumNulls} " +
               f"hasMinMax=${st.hasNonNullValue} " +
               (if (st.hasNonNullValue)
                 s"min=${render(st.genericGetMin)} max=${render(st.genericGetMax)}"
               else "")))
        }
      r.close()
    }

    // ---- fixture 1: the type zoo
    val zooDir = java.nio.file.Files.createTempDirectory("stats_probe_zoo").toString
    Seq(
      (1, 10L, 1.5f, 1.0d, "alpha", true,
        java.sql.Date.valueOf("2024-01-05"),
        java.sql.Timestamp.valueOf("2024-01-05 01:02:03.123456"),
        Seq[java.lang.Long](1L, 2L, null), Seq("a", "b")),
      (2, -3L, Float.NaN, Double.NaN, "é中😀abc", false,
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Seq.empty[java.lang.Long], null),
      (3, 7L, 2.5f, 4.5d, "zz", true, null, null, null, Seq("c")))
      .toDF("i", "l", "f", "d", "s", "b", "dt", "ts", "al", "as2")
      .coalesce(1).write.mode("overwrite").parquet(zooDir)
    val zoo = spark.read.parquet(zooDir)
    println("=== ZOO: SPARK AGG ===")
    println(zoo.agg(min("f"), max("f"), min("d"), max("d"), min("ts"), max("ts"),
      (sum(coalesce(size(col("al")), lit(0))) +
        count_if(coalesce(size(col("al")), lit(0)) === 0)).as("vc_al"))
      .collect()(0))
    println("=== ZOO: FOOTER ===")
    dumpFooter(zooDir)

    // ---- fixture 2: signed zeros + a >4 KB string max
    val edgeDir = java.nio.file.Files.createTempDirectory("stats_probe_edge").toString
    val huge = "zz" + ("x" * 5000)
    Seq((1, -0.0f, -0.0d, "a" * 70), (2, 0.0f, 0.0d, huge), (3, 1.5f, 2.5d, "zz"))
      .toDF("i", "f", "d", "s")
      .coalesce(1).write.mode("overwrite").parquet(edgeDir)
    val edge = spark.read.parquet(edgeDir)
    println("=== EDGE: SPARK AGG ===")
    val row = edge.agg(min("f"), max("f"), min("d"), max("d"), min("s"), max("s")).collect()(0)
    println(s"f: min=${row.get(0)}(bits=${java.lang.Float.floatToRawIntBits(row.getFloat(0))}) max=${row.get(1)}")
    println(s"d: min=${row.get(2)}(bits=${java.lang.Double.doubleToRawLongBits(row.getDouble(2))}) max=${row.get(3)}")
    println(s"s: min=${row.getString(4).take(10)} max(len)=${row.getString(5).length}")
    println("=== EDGE: FOOTER ===")
    dumpFooter(edgeDir)
    spark.stop()
  }
}
