package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injection point, so graft's native expressions
  * are available in any session built with
  * `spark.sql.extensions=graft.expr.GraftSparkExtensions` (or
  * `.withExtensions(new GraftSparkExtensions)`): the standard deployment
  * path for custom Catalyst functions on a shared cluster.
  * Per-session registration for an already-built session lives in
  * [[GraftFunctions.register]].
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("iceberg_decode_numeric"),
      new ExpressionInfo(
        classOf[DecodeNumericExpr].getName, "iceberg_decode_numeric"),
      exprs => DecodeNumericExpr(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      exprs => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("hash_plane_dot"),
      new ExpressionInfo(classOf[HashPlaneDot].getName, "hash_plane_dot"),
      exprs => HashPlaneDot(exprs.head, exprs(1))))
    // iceberg_bucket(col, N): the spec-murmur3 partition transform as a
    // SQL function — lets users pre-compute/debug bucket assignments
    // (`WHERE iceberg_bucket(id, 16) = 3`) with the exact write-path
    // semantics (spec Appendix-B vectors pinned in TransformsSpec)
    ext.injectFunction((
      new FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      exprs => IcebergBucket(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
  }
}
