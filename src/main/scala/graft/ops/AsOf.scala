package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the single right row
  * with the same key and the greatest right timestamp at-or-before the
  * left timestamp — the standard event-attribution / point-in-time-lookup
  * operator that Spark has no built-in for.
  *
  * Implementation is the scalable union + ordered-window formulation, not
  * a range join: tag both sides, union, and carry the latest right payload
  * forward within each key with `last(_, ignoreNulls)` over
  * `(ts, side)`-ordered rows. That is ONE shuffle on the key (the same
  * shuffle any keyed window pays) and a per-partition sort — no
  * `l.ts >= r.ts` theta-join blowup, no per-left-row range scan. At 100 TB
  * the cost profile is exactly a window aggregate's; a skewed key salts
  * the same way any window partition key would.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so an equal-ts
  * right row IS visible to the left row (`l.ts >= r.ts` semantics,
  * matching DuckDB/pandas ASOF). Left rows with no prior right row keep
  * null right columns (left-join semantics). If the right side can hold
  * several rows per (key, ts), dedup it first — "the" latest row is
  * otherwise ill-defined in any engine.
  */
object AsOf {

  /** @param left   probe side; all its columns pass through
    * @param right  lookup side; must contain `key` and `ts`
    * @param key    equality-join column present on both sides
    * @param ts     ordering column present on both sides (any orderable type)
    * @param rightPrefix prefix for the attached right columns in the output
    *                    (right `ts` becomes s"$rightPrefix$ts")
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPrefix: String = "r_"): DataFrame = {
    val lPayload = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val rPayload = right.columns.toSeq.filterNot(c => c == key || c == ts)
    // `__ts`/`__side`/`__r` are reserved internal names, and the prefixed
    // right columns must not collide with left payload columns — either
    // would silently corrupt the output, so fail fast instead.
    val reserved = Set("__ts", "__side", "__r")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")}; found: ${clash.mkString(", ")}")
    val dupOut = lPayload.toSet.intersect((ts +: rPayload).map(rightPrefix + _).toSet)
    require(dupOut.isEmpty,
      s"asofJoin output name collision for prefix '$rightPrefix': ${dupOut.mkString(", ")}")
    val rStruct = struct((col(ts) +: rPayload.map(col)): _*)

    val lNorm = left.select(
      (Seq(col(key), col(ts).as("__ts"), lit(1).as("__side")) ++
        lPayload.map(col) :+
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r")): _*)
    val rNorm = right.select(
      (Seq(col(key), col(ts).as("__ts"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r")): _*)

    // Carry the whole right payload as ONE struct: a single window function
    // regardless of payload width, and legitimately-null right payload
    // fields don't get skipped over (ignoreNulls applies to the struct,
    // which is non-null for every right row).
    val w = Window.partitionBy(key).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))

    val outCols =
      Seq(col(key), col("__ts").as(ts)) ++ lPayload.map(col) ++
        (col("__r").getField(ts).as(s"$rightPrefix$ts") +:
          rPayload.map(c => col("__r").getField(c).as(s"$rightPrefix$c")))
    carried.filter(col("__side") === 1).select(outCols: _*)
  }

  /** As-of join with a MAX-STALENESS tolerance (pandas `merge_asof
    * tolerance=`): a prior right row older than `tolerance` (measured in
    * the ts column's own units, so the column must be numeric) is
    * discarded — the left row keeps null right columns exactly as if no
    * prior right row existed. Same single keyed-window shuffle as
    * [[asofJoin]]; the staleness check is a post-window projection, so
    * the cost profile is unchanged. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, tolerance: Long, rightPrefix: String = "r_"): DataFrame = {
    val joined = asofJoin(left, right, key, ts, rightPrefix)
    val rTs = s"$rightPrefix$ts"
    val rCols = (ts +: right.columns.toSeq.filterNot(c => c == key || c == ts))
      .map(rightPrefix + _)
    // materialize the flag BEFORE the fold nulls rTs out from under it
    val flagged = joined.withColumn("__stale",
      col(rTs).isNull || (col(ts) - col(rTs)) > tolerance)
    rCols.foldLeft(flagged) { (df, c) =>
      df.withColumn(c,
        when(col("__stale"), lit(null).cast(df.schema(c).dataType)).otherwise(col(c)))
    }.drop("__stale")
  }
}
