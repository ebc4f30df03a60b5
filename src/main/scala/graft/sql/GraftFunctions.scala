package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.expr.IcebergTransformOps

/** The catalog's V2 `bucket` function — what Catalyst resolves a
  * `bucket(N, col)` partition TRANSFORM against when checking two scans'
  * `KeyGroupedPartitioning` compatibility for a storage-partitioned
  * join. Semantics are the write path's spec-murmur3 transform
  * ([[graft.expr.IcebergTransformOps]]), so the reported partitioning,
  * the file layout, and the SQL-callable function all agree. Also
  * directly callable: `SELECT graft.system.bucket(16, id)`. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): Iceberg spec-murmur3 bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.size == 2,
      s"bucket takes (numBuckets INT, col); got ${inputType.simpleString}")
    inputType(1).dataType match {
      case dt @ (LongType | IntegerType | DateType | TimestampType) =>
        new BucketNumeric(dt)
      case StringType => BucketStr
      case other => throw new UnsupportedOperationException(
        s"bucket over ${other.simpleString} columns is unsupported")
    }
  }

  private final class BucketNumeric(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.typeName})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val v: Long = dt match {
        case LongType | TimestampType => input.getLong(1)
        case IntegerType | DateType => input.getInt(1).toLong
        case _ => throw new IllegalStateException(s"unreachable: $dt")
      }
      IcebergTransformOps.bucketLong(v, input.getInt(0))
    }
  }

  private object BucketStr extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(string)"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      IcebergTransformOps.bucketString(
        input.get(1, StringType).asInstanceOf[UTF8String], input.getInt(0))
  }
}
