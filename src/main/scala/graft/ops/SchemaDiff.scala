package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-evolution diffing (ref `tui/widgets.py:310-350`) and cross-table
  * schema-conflict detection (ref `formatters.py:1385-1400`).
  *
  * The reference diffs schema versions by stable field id with Python dict
  * walks; here it is a full-outer equi-join on the id plus a `when`
  * classification — broadcastable (schemas are tiny) and planner-friendly.
  */
object SchemaDiff {

  /** J2 — classify each key as added / removed / changed / same between an
    * old and a new version. Inputs carry (`keyCol`, `attrCol`). */
  def diff(oldV: DataFrame, newV: DataFrame, keyCol: String, attrCol: String): DataFrame = {
    val o = oldV.select(col(keyCol).as("o_key"), col(attrCol).as("o_attr"))
    val n = newV.select(col(keyCol).as("n_key"), col(attrCol).as("n_attr"))
    o.join(n, col("o_key") === col("n_key"), "full_outer")
      .select(
        coalesce(col("o_key"), col("n_key")).as(keyCol),
        when(col("o_key").isNull, "added")
          .when(col("n_key").isNull, "removed")
          .when(col("o_attr") =!= col("n_attr"), "changed")
          .otherwise(lit("same"))
          .as("status"),
        col("o_attr").as("old_attr"),
        col("n_attr").as("new_attr"))
  }

  /** J5 — field names bound to more than one distinct type across tables
    * (ref `formatters.py:1385-1400`): aggregation-style, no self-join. */
  def conflicts(fields: DataFrame, nameCol: String, typeCol: String): DataFrame =
    fields.groupBy(nameCol)
      .agg(
        countDistinct(col(typeCol)).as("n_types"),
        concat_ws(",", sort_array(collect_set(col(typeCol)))).as("types"))
      .filter(col("n_types") > 1)
}
