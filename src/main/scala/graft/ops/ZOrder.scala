package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) multi-column clustering: map each row of k
  * integral columns to one interleaved-bit value, so that rows close in
  * z-value are close in EVERY dimension at once. Rewriting files grouped
  * by z-range gives every file tight min/max bounds on ALL the clustered
  * columns simultaneously — the data-layout optimization that makes
  * metadata bound pruning ([[ScanPlanner.readTableWhere]], the SQL
  * catalog's [[graft.sql.FilePrune]]) effective for multi-dimensional
  * predicates at 100 TB (a lexicographic sort only tightens the leading
  * column). Same operator family as Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')`.
  *
  * Determinism contract: binning is pure BIGINT arithmetic
  * (`((v - lo) * 2^bits) div (hi - lo + 1)`, clamped) and interleaving is
  * pure bit shifts — engine-exact, so the z-value has a value-exact
  * DuckDB oracle (`q_zorder`). Equi-width bins are skew-sensitive (a
  * hot value concentrates rows in one bin); acceptable for layout
  * clustering because file SIZES, not bin ids, bound work downstream.
  */
object ZOrder {

  /** Equi-width bin id of `c` over [lo, hi] at `bits` resolution —
    * `clamp(((c - lo) * 2^bits) div (hi - lo + 1), 0, 2^bits - 1)`,
    * all BIGINT (overflow-safe while (hi-lo) * 2^bits < 2^63). */
  def binCol(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val nbins = 1L << bits
    val raw = call_function("div",
      (c.cast("long") - lo) * lit(nbins), hi - lo + lit(1L))
    least(greatest(raw, lit(0L)), lit(nbins - 1L))
  }

  /** Interleave the low `bits` bits of each bin column: bit j of bin i
    * lands at position `j * k + i` of the z-value (Morton encoding).
    * Pure shift/and/or — stays inside whole-stage codegen. */
  def interleave(bins: Seq[Column], bits: Int): Column = {
    require(bins.nonEmpty && bins.size * bits <= 62,
      s"${bins.size} cols x $bits bits exceeds the 62-bit z-value budget")
    (for { j <- 0 until bits; i <- bins.indices } yield
      shiftleft(shiftright(bins(i), j).bitwiseAND(lit(1L)), j * bins.size + i))
      .reduce(_.bitwiseOR(_))
  }

  /** Append z-value column `as` computed over `cols` (integral types).
    * Per-column lo/hi ride along as a broadcast 1-row cross-join — no
    * driver action, the same shape the corpus scalars take in
    * [[Retrieval.bm25]]. */
  def withZValue(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      as: String = "zval"): DataFrame = {
    val stats = df.agg(
      min(col(cols.head).cast("long")).as(s"__zlo_0"),
      (cols.tail.zipWithIndex.flatMap { case (c, i) => Seq(
        min(col(c).cast("long")).as(s"__zlo_${i + 1}"),
        max(col(c).cast("long")).as(s"__zhi_${i + 1}"))
      } :+ max(col(cols.head).cast("long")).as(s"__zhi_0")): _*)
    val joined = df.crossJoin(broadcast(stats))
    val bins = cols.zipWithIndex.map { case (c, i) =>
      binCol(col(c), col(s"__zlo_$i"), col(s"__zhi_$i"), bits) }
    joined
      .withColumn(as, interleave(bins, bits))
      .drop(stats.columns: _*)
  }
}
