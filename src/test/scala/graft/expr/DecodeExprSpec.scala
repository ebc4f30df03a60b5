package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native decode Expression must agree with the UDF fallback and the
  * driver-side codec, including null/non-numeric tags. */
class DecodeExprSpec extends SparkSpec {

  test("expression and UDF decode identically across types") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq(
      ("int", IcebergDecode.encode("int", 42)),
      ("long", IcebergDecode.encode("long", -7L)),
      ("double", IcebergDecode.encode("double", 3.25)),
      ("float", IcebergDecode.encode("float", 1.5f)),
      ("date", IcebergDecode.encode("date", 19723)),
      ("timestamp", IcebergDecode.encode("timestamp", 1704067200000000L)),
      ("string", IcebergDecode.encode("string", "abc")),
      ("int", null))
    val df = rows.toDF("ftype", "bin")
    val out = df.select(
      IcebergDecode.decodeNum(col("ftype"), col("bin")).as("e"),
      IcebergDecode.decodeNumUdf(col("ftype"), col("bin")).as("u")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(out(0).getDouble(0) == 42.0)
    assert(out(2).getDouble(0) == 3.25)
    assert(out(6).isNullAt(0)) // string tag → null
    assert(out(7).isNullAt(0)) // null bytes → null
  }

  test("SQL-registered function decodes from spark.sql") {
    GraftFunctions.register(spark)
    val s2 = spark
    import s2.implicits._
    Seq(("long", IcebergDecode.encode("long", 99L)))
      .toDF("ftype", "bin").createOrReplaceTempView("bounds_t")
    val r = spark.sql(
      "SELECT iceberg_decode_numeric(ftype, bin) AS v FROM bounds_t").collect().head
    assert(r.getDouble(0) == 99.0)
  }

  test("expression participates in aggregation (min/max over decoded bounds)") {
    val s2 = spark
    import s2.implicits._
    val df = (1 to 100).map(i => ("long", IcebergDecode.encode("long", i.toLong)))
      .toDF("ftype", "bin")
    val r = df.agg(
      min(IcebergDecode.decodeNum(col("ftype"), col("bin"))).as("lo"),
      max(IcebergDecode.decodeNum(col("ftype"), col("bin"))).as("hi")).collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 100.0)
  }
}
