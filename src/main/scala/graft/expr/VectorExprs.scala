package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Primitive kernels behind the native vector expressions. Static methods
  * so the generated code calls straight into them — element access stays
  * `getFloat`/`getDouble` (no boxing, no lambda dispatch), which is what
  * makes these ~an order of magnitude faster than the equivalent
  * `aggregate(zip_with(...))` higher-order functions whose fold body is
  * interpreted per element.
  *
  * Null semantics mirror the HOF formulation they replace
  * (`aggregate(zip_with(a, b, (p,q) -> p*q), 0d, (acc,v) -> acc+v)`):
  * a length mismatch (zip_with pads with null) or any null element poisons
  * the fold, so the result is SQL NULL. Summation is sequential in index
  * order — bit-for-bit the result the fold produced.
  */
object VecOps {

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Dot product against a deterministic pseudo-random hyperplane whose
    * weights are a pure integer mix (1-based component j of plane p):
    * `w = (((j + p*8191) * 2654435761) % 1000000007 % 2001 - 1000) / 1000`
    * — values in [-1, 1], engine-portable (plain arithmetic any SQL engine
    * reproduces exactly, unlike murmur3/xxhash), computed on the fly so no
    * weight array is materialized per row. Summation is sequential in
    * index order, so an oracle using the same left-fold matches the sign
    * (and therefore the LSH bucket) bit for bit. */
  def hashPlaneDot(v: ArrayData, plane: Int, isFloat: Boolean): java.lang.Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val w = (((i + 1L) + plane * 8191L) * 2654435761L % 1000000007L % 2001L - 1000L).toDouble / 1000.0
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      s += x * w
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Analysis-time input check shared by the vector kernels: the argument
    * must be `array<float>` or `array<double>` — an `array<int>`/
    * `array<bigint>` would read garbage through getFloat/getDouble strides,
    * so misuse must fail at analysis, not return wrong numbers.
    * (TypeCollection/ExpectsInputTypes are private[sql], hence manual.) */
  def checkVecArg(name: String, argPos: Int, t: DataType): TypeCheckResult = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name argument $argPos must be array<float> or array<double>, got ${other.sql}")
  }

  /** The DuckDB twin of [[hashPlaneDot]]: a sequential left-fold over the
    * same per-component products, for oracle SQL generation. */
  def duckDbPlaneDot(vecExpr: String, plane: Int): String =
    s"list_reduce(list_transform(range(1, len($vecExpr) + 1), i -> " +
      s"CAST($vecExpr[i] AS DOUBLE) * " +
      s"((((i + $plane * 8191) * 2654435761) % 1000000007 % 2001 - 1000) / 1000.0)), " +
      "(x, y) -> x + y)"
}

/** `vec_dot(array<float|double>, array<float|double>) -> double` — the hot
  * kernel of every similarity operator (cosine = dot / (norm·norm)). A
  * native expression with `doGenCode` keeps the whole similarity
  * projection inside one WholeStageCodegen span; the HOF formulation it
  * replaces ran an interpreted lambda per element per row. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).zipWithIndex.map { case (e, i) =>
      VecOps.checkVecArg(prettyName, i, e.dataType)
    }.collectFirst { case f: TypeCheckResult.TypeCheckFailure => f }
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r =
         |  graft.expr.VecOps.dot($a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hash_plane_dot(vec, planeId) -> double`: dot of a vector with the
  * fixed pseudo-random hyperplane `planeId` (see [[VecOps.hashPlaneDot]]).
  * Powers random-hyperplane LSH signatures without materializing weight
  * arrays. `planeId` must be an int (typically a foldable literal). */
case class HashPlaneDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVecArg(prettyName, 0, left.dataType) match {
      case f: TypeCheckResult.TypeCheckFailure => f
      case _ if right.dataType != IntegerType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName plane id must be INT, got ${right.dataType.sql}")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hash_plane_dot"

  override def nullSafeEval(v: Any, plane: Any): Any =
    VecOps.hashPlaneDot(v.asInstanceOf[ArrayData], plane.asInstanceOf[Int], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val r = ctx.freshName("pdot")
      s"""
         |java.lang.Double $r = graft.expr.VecOps.hashPlaneDot($v, $p, $elemIsFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
