package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

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

  /** Dot product against the deterministic hash-derived hyperplane
    * `w_i = (murmur3(i*31 + plane*101, seed=42) % 1000) / 1000.0` — the
    * same weights the SQL `hash(i*31 + p*101) % 1000 / 1000.0` transform
    * yields (Spark's `hash()` is Murmur3 with seed 42, `%` keeps the
    * dividend's sign), without materializing a weight array per row. */
  def hashPlaneDot(v: ArrayData, plane: Int, isFloat: Boolean): java.lang.Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val w = (Murmur3_x86_32.hashInt(i * 31 + plane * 101, 42) % 1000).toDouble / 1000.0
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      s += x * w
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
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
