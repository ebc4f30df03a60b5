package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) a DuckDB oracle over the same parquet tables.
  * Queries without an oracle get the driver's weaker rows-only check.
  *
  * Determinism contract (SURVEY §7.4): every query ends in an explicit
  * total ordering, money sums go through DECIMAL(18,2) (order-independent),
  * and derived doubles mirror the exact operation order of their oracle.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  lazy val all: Seq[Q] =
    CoreQueries.all ++ FormatQueries.all ++ PipelineQueries.all ++ WriteQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
