package graft.expr

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Encode/decode round-trip properties for the Iceberg single-value binary
  * codec (SURVEY §5 plan item 3). Property-style sampling with a fixed seed
  * (scalatestplus-scalacheck isn't resolvable offline; plain seeded
  * sampling keeps the same coverage deterministically). */
class IcebergDecodeSpec extends AnyFunSuite {

  private val rng = new Random(42)
  private val N = 500

  test("int round-trip") {
    (0 until N).foreach { _ =>
      val v = rng.nextInt()
      assert(IcebergDecode.decode("int", IcebergDecode.encode("int", v)) == v)
    }
  }

  test("long/timestamp round-trip") {
    (0 until N).foreach { _ =>
      val v = rng.nextLong()
      assert(IcebergDecode.decode("long", IcebergDecode.encode("long", v)) == v)
      assert(IcebergDecode.decode("timestamp", IcebergDecode.encode("timestamp", v)) == v)
    }
  }

  test("double round-trip (bit-exact, incl. specials)") {
    val specials = Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue)
    (specials ++ (0 until N).map(_ => rng.nextDouble() * math.pow(10, rng.nextInt(20) - 10)))
      .foreach { v =>
        val out = IcebergDecode.decode("double", IcebergDecode.encode("double", v))
        assert(java.lang.Double.doubleToRawLongBits(out.asInstanceOf[Double]) ==
          java.lang.Double.doubleToRawLongBits(v) ||
          (v.isNaN && out.asInstanceOf[Double].isNaN))
      }
  }

  test("float round-trip") {
    (0 until N).foreach { _ =>
      val v = rng.nextFloat()
      val out = IcebergDecode.decode("float", IcebergDecode.encode("float", v))
      assert(java.lang.Float.floatToIntBits(out.asInstanceOf[Float]) ==
        java.lang.Float.floatToIntBits(v))
    }
  }

  test("string round-trip (unicode)") {
    val samples = Seq("", "abc", "héllo wörld", "数据湖", "a/b\\c\"d\ne") ++
      (0 until N).map(_ => rng.nextString(rng.nextInt(40)))
    samples.foreach { v =>
      assert(IcebergDecode.decode("string", IcebergDecode.encode("string", v)) == v)
    }
  }

  test("boolean round-trip") {
    assert(IcebergDecode.decode("boolean", IcebergDecode.encode("boolean", true)) == true)
    assert(IcebergDecode.decode("boolean", IcebergDecode.encode("boolean", false)) == false)
  }

  test("little-endian layout matches the Iceberg spec") {
    assert(IcebergDecode.encode("int", 1).toSeq == Seq[Byte](1, 0, 0, 0))
    assert(IcebergDecode.encode("long", 1L).toSeq ==
      Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
  }

  test("decodeNumeric is None for strings, Some for numerics") {
    assert(IcebergDecode.decodeNumeric("string", "abc".getBytes).isEmpty)
    assert(IcebergDecode.decodeNumeric("int", IcebergDecode.encode("int", 7))
      .contains(7.0))
    assert(IcebergDecode.decodeNumeric("date", IcebergDecode.encode("date", 19723))
      .contains(19723.0))
  }
}
