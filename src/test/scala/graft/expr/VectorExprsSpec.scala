package graft.expr

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native vector kernels must agree bit-for-bit with the
  * `aggregate(zip_with(...))` higher-order-function formulations they
  * replaced (same sequential summation order), including the null / length
  * mismatch poison semantics. */
class VectorExprsSpec extends SparkSpec {

  private def hofDot(x: String, y: String) = expr(
    s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  private def vecDot(x: String, y: String) =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(col(x)), GraftColumnBridge.expression(col(y))))

  test("vec_dot equals the HOF fold bit-for-bit on random float vectors") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(20260812L)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2f - 1f),
      Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      vecDot("a", "b").as("native"), hofDot("a", "b").as("hof")).collect()
    out.foreach { r =>
      // bit-for-bit: same summation order, same double arithmetic
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot: length mismatch and null inputs are SQL NULL") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f, 5f)), // mismatch → null (zip_with pads)
      (Array(1f, 2f), Array(3f, 4f))      // fine
    ).toDF("a", "b")
    val out = df.select(vecDot("a", "b").as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 11.0)
    // null array → null result (nullSafeEval path)
    val nulls = Seq((Option.empty[Array[Float]], Option(Array(1f, 2f))))
      .toDF("a", "b")
    assert(nulls.select(vecDot("a", "b").as("d")).collect().head.isNullAt(0))
  }

  test("hash_plane_dot equals the portable integer-mix plane fold bit-for-bit") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(42L)
    val df = Seq.fill(100)(Array.fill(48)(rnd.nextFloat() * 2f - 1f)).toDF("embedding")
    (0 until 6).foreach { p =>
      // the same 1-based-index congruential weight the kernel (and the
      // DuckDB oracle twin) computes
      val hof = expr(
        s"aggregate(zip_with(embedding, transform(sequence(0, size(embedding) - 1), " +
          s"i -> CAST(((i + 1) + $p * 8191L) * 2654435761L % 1000000007L % 2001L - 1000L AS DOUBLE) / 1000.0), " +
          "(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
      val native = GraftColumnBridge.column(HashPlaneDot(
        GraftColumnBridge.expression(col("embedding")),
        GraftColumnBridge.expression(lit(p))))
      df.select(native.as("n"), hof.as("h")).collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"plane $p")
      }
    }
  }

  test("SQL-registered vec_dot works from spark.sql and double arrays") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect().head
    assert(r.getDouble(0) == 11.0)
  }

  test("SQL-registered iceberg_bucket matches the write path's transform") {
    GraftFunctions.register(spark)
    // Iceberg spec Appendix B: bucket hash of long 34 is 2017239379;
    // bucket[16] = 2017239379 & Int.MaxValue mod 16 = 3 (same vector
    // TransformsSpec pins for the write path)
    val r = spark.sql("SELECT iceberg_bucket(CAST(34 AS BIGINT), 16) AS b")
      .collect().head
    val expected = graft.expr.IcebergTransformOps.bucketLong(34L, 16)
    assert(r.getInt(0) == expected)
  }

  test("md5_prefix native kernel equals the conv(substring(md5)) formulation") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7L)
    val strs = Seq.tabulate(300)(i => rnd.nextString(1 + rnd.nextInt(40))) ++
      Seq("", "hello world", "的 中文 text", "éàüß", "a b c")
    val df = strs.toDF("s")
    Seq[(Int, org.apache.spark.sql.Column)](
      (8, PortableHash.md5Hash32(col("s"))),
      (15, PortableHash.md5Hash60(col("s")))).foreach { case (n, native) =>
      val out = df.select(
        native.as("native"),
        PortableHash.md5HashSql(col("s"), n).as("composed")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1), s"nHex=$n"))
    }
    // type/arity misuse fails analysis
    val e = intercept[Exception](df.select(GraftColumnBridge.column(
      Md5Prefix(GraftColumnBridge.expression(lit(5)), 8))).collect())
    assert(e.getMessage.contains("must be STRING"))
  }

  test("vec_dot / hash_plane_dot reject non-float array inputs at analysis") {
    val s2 = spark
    import s2.implicits._
    val ints = Seq((Array(1, 2, 3), Array(4, 5, 6))).toDF("a", "b")
    // analysis is eager in Spark 4, so .select itself throws
    val e1 = intercept[Exception](ints.select(GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(col("a")), GraftColumnBridge.expression(col("b"))))).collect())
    assert(e1.getMessage.contains("array<float> or array<double>"))
    val e2 = intercept[Exception](ints.select(GraftColumnBridge.column(HashPlaneDot(
      GraftColumnBridge.expression(col("a")), GraftColumnBridge.expression(lit(0))))).collect())
    assert(e2.getMessage.contains("array<float> or array<double>"))
    // bigint plane id is rejected too (used to break codegen silently)
    val floats = Seq(Array(1f, 2f)).toDF("v")
    val e3 = intercept[Exception](floats.select(GraftColumnBridge.column(HashPlaneDot(
      GraftColumnBridge.expression(col("v")), GraftColumnBridge.expression(lit(0L))))).collect())
    assert(e3.getMessage.contains("plane id must be INT"))
  }
}
