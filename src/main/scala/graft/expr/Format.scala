package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Display-layer scalar functions (ref `utils.py:8-35`,
  * `formatters.py:38-56,363-372`, `tui/widgets.py:1091-1099`), expressed as
  * codegen-friendly `Column` combinators (no UDFs).
  *
  * Fractions are truncated to one decimal via `floor(x*10)/10` before
  * `%.1f` formatting so the rendered string is bit-identical across engines
  * (printf half-even vs Java half-up rounding never gets a .x5 input).
  */
object Format {

  private val K = 1024L
  private def f1(x: Column): Column = format_string("%.1f", floor(x * 10) / 10)

  /** F1 — `format_bytes`: 1024-based B…TB with one decimal
    * (ref `utils.py:8-14`). */
  def formatBytes(b: Column): Column =
    when(b < K, concat(b.cast("string"), lit(" B")))
      .when(b < K * K, concat(f1(b.cast("double") / K), lit(" KB")))
      .when(b < K * K * K, concat(f1(b.cast("double") / (K * K)), lit(" MB")))
      .when(b < K * K * K * K, concat(f1(b.cast("double") / (K * K * K)), lit(" GB")))
      .otherwise(concat(f1(b.cast("double") / (K * K * K * K)), lit(" TB")))

  /** Driver-side twin of [[formatBytes]] for the text render layer. */
  def formatBytesStr(b: Long): String = {
    def f1(x: Double): String = f"${math.floor(x * 10) / 10}%.1f"
    if (b < K) s"$b B"
    else if (b < K * K) s"${f1(b.toDouble / K)} KB"
    else if (b < K * K * K) s"${f1(b.toDouble / (K * K))} MB"
    else if (b < K * K * K * K) s"${f1(b.toDouble / (K * K * K))} GB"
    else s"${f1(b.toDouble / (K * K * K * K))} TB"
  }

  /** F2 — epoch-ms → `yyyy-MM-dd HH:mm:ss UTC` (ref `utils.py:17-25`). */
  def formatTs(ts: Column): Column =
    concat(date_format(ts, "yyyy-MM-dd HH:mm:ss"), lit(" UTC"))

  /** F3 — `truncate_path`: keep short paths, else `.../filename`
    * (ref `utils.py:28-35`). */
  def truncatePath(p: Column, maxLen: Int = 60): Column =
    when(length(p) <= maxLen, p)
      .otherwise(concat(lit(".../"), regexp_extract(p, "[^/]*$", 0)))

  /** F4 — explicit +/- sign (ref `formatters.py:50-56`). */
  def formatNet(n: Column): Column =
    when(n >= 0, concat(lit("+"), n.cast("string"))).otherwise(n.cast("string"))

  /** F8 — compact 1.2K/3.4M/5.6B numbers (ref `tui/widgets.py:1091-1099`). */
  def compactNumber(n: Column): Column = {
    val M = 1000L * 1000L
    val B = M * 1000L
    when(n < 1000L, n.cast("string"))
      .when(n < M, concat(f1(n.cast("double") / 1000L), lit("K")))
      .when(n < B, concat(f1(n.cast("double") / M), lit("M")))
      .otherwise(concat(f1(n.cast("double") / B), lit("B")))
  }
}
