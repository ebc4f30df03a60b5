package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the Iceberg single-value numeric decode
  * (ref `pyiceberg.conversions.from_bytes`, `formatters.py:578-604`):
  * `decode_numeric(typeTag, bytes) -> double`, null for non-numeric tags.
  *
  * The codegen emits a direct static call, so the decode stays inside the
  * whole-stage codegen span — no UDF closure serialization, no per-row
  * encoder round-trip (SURVEY §2.9's planned UDF→Expression upgrade).
  */
case class DecodeNumericExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "iceberg_decode_numeric"

  override def nullSafeEval(typeTag: Any, bytes: Any): Any =
    IcebergDecode.decodeNumericBoxed(typeTag.toString, bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) => {
      val r = ctx.freshName("decoded")
      s"""
         |java.lang.Double $r =
         |  graft.expr.IcebergDecode.decodeNumericBoxed($t.toString(), $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
