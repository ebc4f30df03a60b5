package graft.expr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Iceberg single-value binary (de)serialization (spec "Binary single-value
  * serialization": little-endian fixed-width numerics, UTF-8 strings,
  * date = int days, timestamp = long micros). The reference decodes bounds
  * with `pyiceberg.conversions.from_bytes` (ref `formatters.py:578-604`);
  * here it is a pair of Scala codecs plus a UDF that decodes to a DOUBLE
  * (numeric types) for min/max aggregation, mirroring the reference's
  * "primitive types only" rule (ref `formatters.py:584-586`).
  */
object IcebergDecode {

  def encode(fieldType: String, value: Any): Array[Byte] = fieldType match {
    case "boolean" => Array[Byte](if (value.asInstanceOf[Boolean]) 1 else 0)
    case "int" | "date" =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(value.asInstanceOf[Int]).array()
    case "long" | "timestamp" | "timestamptz" =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(value.asInstanceOf[Long]).array()
    case "float" =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(value.asInstanceOf[Float]).array()
    case "double" =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(value.asInstanceOf[Double]).array()
    case "string" => value.toString.getBytes(StandardCharsets.UTF_8)
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  def decode(fieldType: String, bytes: Array[Byte]): Any = {
    lazy val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    fieldType match {
      case "boolean"                       => bytes(0) != 0
      case "int" | "date"                  => bb.getInt
      // length-aware for TYPE PROMOTION (Iceberg spec): a file written
      // before an int→long / float→double widen keeps its 4-byte bounds
      // under the widened read type — decode by buffer width
      case "long" | "timestamp" | "timestamptz" =>
        if (bytes.length == 4) bb.getInt.toLong else bb.getLong
      case "float"                         => bb.getFloat
      case "double" =>
        if (bytes.length == 4) bb.getFloat.toDouble else bb.getDouble
      case "string"                        => new String(bytes, StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }

  /** Numeric decode for bound aggregation (null for non-numeric types). */
  def decodeNumeric(fieldType: String, bytes: Array[Byte]): Option[Double] =
    if (bytes == null) None
    else fieldType match {
      case "int" | "date" => Some(decode(fieldType, bytes).asInstanceOf[Int].toDouble)
      case "long" | "timestamp" | "timestamptz" =>
        Some(decode(fieldType, bytes).asInstanceOf[Long].toDouble)
      case "float" => Some(decode(fieldType, bytes).asInstanceOf[Float].toDouble)
      case "double" => Some(decode(fieldType, bytes).asInstanceOf[Double])
      case _ => None
    }

  /** Boxed variant callable from generated Java (static forwarder). */
  def decodeNumericBoxed(fieldType: String, bytes: Array[Byte]): java.lang.Double =
    decodeNumeric(fieldType, bytes).map(Double.box).orNull

  /** Native-Expression column form (codegen'd — stays inside whole-stage
    * spans, unlike a Scala UDF): `decodeNum(typeCol, binCol)` → double. */
  def decodeNum(typeCol: Column, binCol: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DecodeNumericExpr(expression(typeCol), expression(binCol)))

  /** UDF fallback kept for comparison/benchmarks. */
  private val decodeNumericUdf =
    udf((t: String, b: Array[Byte]) => decodeNumeric(t, b))

  def decodeNumUdf(typeCol: Column, binCol: Column): Column =
    decodeNumericUdf(typeCol, binCol)

  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** String rendering of any decoded value (display layer). */
  private val decodeStrUdf =
    udf((t: String, b: Array[Byte]) => if (b == null) null else decode(t, b).toString)

  def decodeStr(typeCol: Column, binCol: Column): Column = decodeStrUdf(typeCol, binCol)
}
