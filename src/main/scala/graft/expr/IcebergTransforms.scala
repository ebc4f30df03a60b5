package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition-transform hash kernel: the 32-bit Murmur3 (x86
  * variant, seed 0) the Iceberg spec prescribes for `bucket[N]`
  * (https://iceberg.apache.org/spec/#appendix-b-32-bit-hash-requirements).
  * Integral values hash as the 8-byte little-endian long; strings hash
  * their UTF-8 bytes. Spark's own `Murmur3_x86_32.hashUnsafeBytes` is NOT
  * usable here: its tail handling mixes remaining bytes one-by-one
  * instead of the standard combined-tail block, so any byte length not a
  * multiple of 4 diverges from the spec vectors.
  *
  * Spec test vectors (Appendix B): hash(34L) = 2017239379,
  * hash("iceberg") = 1210000089, hash(17486 as date) = -653330422,
  * hash(1510871468000000L as timestamp) = -2047944441. Pinned in
  * `TransformsSpec`. */
object IcebergTransformOps {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  @inline private def mixK1(k: Int): Int = {
    var k1 = k * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  @inline private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  @inline private def fmix(hIn: Int, len: Int): Int = {
    var h = hIn ^ len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Standard murmur3_x86_32 of the 8-byte little-endian encoding. */
  def hashLong(v: Long): Int = {
    var h1 = mixH1(0, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** Standard murmur3_x86_32 over a byte array, seed 0 (combined-tail
    * semantics per the reference algorithm). */
  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    val nblocks = len >>> 2
    var h1 = 0
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      val k = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      h1 ^= mixK1(k1)
    }
    fmix(h1, len)
  }

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Integer.MAX_VALUE) % n

  def bucketString(s: UTF8String, n: Int): Int =
    (hashBytes(s.getBytes) & Integer.MAX_VALUE) % n

  /** Iceberg `truncate[W]` for integral values: floor-to-width (negative
    * values truncate toward negative infinity, per spec). */
  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)
}

/** `iceberg_bucket(col, N) -> int`: the Iceberg spec bucket transform as
  * a native codegen expression — used by the write path to stage
  * partition values and by the scan planner (driver-side, via
  * [[IcebergTransformOps]]) to map equality predicates onto bucket
  * numbers for file pruning. Accepts int/long/date/timestamp (hashed as
  * the promoted long) and string (UTF-8 bytes). */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName bucket count must be >= 1, got $n")
    else child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be int/long/date/timestamp/string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergTransformOps.bucketLong(input.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType =>
      IcebergTransformOps.bucketLong(input.asInstanceOf[Long], n)
    case StringType =>
      IcebergTransformOps.bucketString(input.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.expr.IcebergTransformOps.bucketLong((long) $c, $n)")
      case LongType | TimestampType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.expr.IcebergTransformOps.bucketLong($c, $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.expr.IcebergTransformOps.bucketString($c, $n)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
