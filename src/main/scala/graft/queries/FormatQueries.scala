package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.expr.Format

/** F1–F5/F8 scalar formatting (ref `utils.py:8-35`, `formatters.py:50-56`,
  * `tui/widgets.py:1091-1099`) exercised on a small deterministic
  * projection. Fraction digits are truncated (floor) before `%.1f` so Java
  * and C printf rounding agree bit-for-bit.
  */
object FormatQueries {

  val all: Seq[Q] = Seq(
    Q("q_format_scalar",
      (s, d) => {
        val base = orders(s, d)
          .select("o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority")
          .orderBy("o_orderkey")
          .limit(10)
        val b = floor(col("o_totalprice") * 1000).cast("long")
        val n = col("o_orderkey") % 7 - 3
        val compactIn = (col("o_orderkey") + 1) * 1234567L
        val path = when(col("o_orderkey") % 2 === 0,
            concat(lit("db/t/p-"), col("o_orderkey").cast("string"), lit(".parquet")))
          .otherwise(concat(
            lit("warehouse/sales/orders/region="), col("o_orderpriority"),
            lit("/data/part-"), lpad(col("o_orderkey").cast("string"), 10, "0"),
            lit(".parquet")))
        base.select(
            col("o_orderkey"),
            Format.formatBytes(b).as("bytes_str"),
            Format.formatTs(col("o_orderdate")).as("ts_str"),
            Format.formatNet(n).as("net_str"),
            Format.truncatePath(path).as("path_str"),
            Format.compactNumber(compactIn).as("compact_str"))
          .orderBy("o_orderkey")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority
             |  FROM orders ORDER BY o_orderkey LIMIT 10),
             |c AS (
             |  SELECT o_orderkey, o_orderdate,
             |    CAST(floor(o_totalprice * 1000) AS BIGINT) AS b,
             |    o_orderkey % 7 - 3 AS net,
             |    (o_orderkey + 1) * 1234567 AS cn,
             |    CASE WHEN o_orderkey % 2 = 0
             |      THEN 'db/t/p-' || CAST(o_orderkey AS VARCHAR) || '.parquet'
             |      ELSE 'warehouse/sales/orders/region=' || o_orderpriority
             |           || '/data/part-' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
             |           || '.parquet' END AS p
             |  FROM base)
             |SELECT o_orderkey,
             |  CASE WHEN b < 1024 THEN CAST(b AS VARCHAR) || ' B'
             |       WHEN b < 1048576 THEN printf('%.1f', floor((CAST(b AS DOUBLE) / 1024) * 10) / 10) || ' KB'
             |       WHEN b < 1073741824 THEN printf('%.1f', floor((CAST(b AS DOUBLE) / 1048576) * 10) / 10) || ' MB'
             |       WHEN b < 1099511627776 THEN printf('%.1f', floor((CAST(b AS DOUBLE) / 1073741824) * 10) / 10) || ' GB'
             |       ELSE printf('%.1f', floor((CAST(b AS DOUBLE) / 1099511627776) * 10) / 10) || ' TB' END AS bytes_str,
             |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || ' UTC' AS ts_str,
             |  CASE WHEN net >= 0 THEN '+' || CAST(net AS VARCHAR)
             |       ELSE CAST(net AS VARCHAR) END AS net_str,
             |  CASE WHEN length(p) <= 60 THEN p
             |       ELSE '.../' || regexp_extract(p, '[^/]*$') END AS path_str,
             |  CASE WHEN cn < 1000 THEN CAST(cn AS VARCHAR)
             |       WHEN cn < 1000000 THEN printf('%.1f', floor((CAST(cn AS DOUBLE) / 1000) * 10) / 10) || 'K'
             |       WHEN cn < 1000000000 THEN printf('%.1f', floor((CAST(cn AS DOUBLE) / 1000000) * 10) / 10) || 'M'
             |       ELSE printf('%.1f', floor((CAST(cn AS DOUBLE) / 1000000000) * 10) / 10) || 'B' END AS compact_str
             |FROM c ORDER BY o_orderkey""".stripMargin)),
  )
}
