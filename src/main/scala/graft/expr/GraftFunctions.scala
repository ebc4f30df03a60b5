package graft.expr

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of graft's native expressions, so the engine's
  * custom functions are usable from `spark.sql(...)` alongside the Column
  * API (SURVEY §2.9). */
object GraftFunctions {

  /** Register `iceberg_decode_numeric(typeTag, bytes)`,
    * `vec_dot(a, b)` and `hash_plane_dot(vec, plane)` on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iceberg_decode_numeric",
      exprs => DecodeNumericExpr(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => VecDot(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_plane_dot",
      exprs => HashPlaneDot(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iceberg_bucket",
      exprs => IcebergBucket(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }
}
