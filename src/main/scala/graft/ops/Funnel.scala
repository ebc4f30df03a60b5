package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream —
  * the product-analytics counterpart of the corpus operators (beyond the
  * reference's operator set; part of the large-scale pipeline extension
  * surface, same family as `q_sessionize`/`q_asof_attrib`).
  *
  * Scale shape: every aggregation and join in both operators keys on the
  * user column, so the per-step cascade reuses one hash partitioning end
  * to end (Spark's ReuseExchange dedupes the identical scans+shuffles);
  * nothing is collected to the driver and no global sort happens before
  * the final tiny result.
  */
object Funnel {

  /** Strictly-ordered funnel: for each prefix of `steps`, the number of
    * users with a chain of events e1 ≤ e2 ≤ … matching the step types in
    * order (first-touch semantics: each level keeps the EARLIEST
    * qualifying timestamp, which maximizes the users counted at the next
    * level — the standard product-funnel definition).
    *
    * Emits `(step_no, step, n_users)` ordered by `step_no`.
    *
    * @param events event table
    * @param userCol user key column name
    * @param tsCol   monotone event-time column name (any integral unit)
    * @param typeCol event-type column name
    * @param steps   ordered funnel step types (≥ 1)
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // reached(i): (user, t_i) = earliest completion time of step prefix i
    val levels = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val stepEvents = events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol).as("__ts"))
        val qualified = prev match {
          case None => stepEvents
          case Some(r) =>
            stepEvents.join(r, userCol).filter(col("__ts") >= col("__t"))
        }
        Some(qualified.groupBy(userCol).agg(min(col("__ts")).as("__t")))
    }.flatten
    levels.zipWithIndex.map { case (reached, i) =>
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i).cast("int").as("step_no"),
          lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_.unionByName(_)).orderBy("step_no")
  }

  /** Weekly cohort retention: cohort = the user's first active week
    * (integer epoch-week of `tsCol`), and for every (cohort, offset) the
    * number of cohort users active `offset` weeks later. Two keyed
    * aggregations + one key join — the classic retention triangle,
    * shuffle-bounded by distinct (user, week).
    *
    * Emits `(cohort_week, week_offset, n_users)` ordered by both.
    *
    * @param tsCol epoch-NANOSECOND event time (the `events.ts` surface
    *              under `nanosAsLong`); weeks are `ts / 1000 / 604.8e9`
    *              in integer arithmetic, matching the oracle exactly.
    */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val active = events
      .select(col(userCol), expr(s"($tsCol div 1000) div $weekUs").as("week"))
      .distinct()
    val cohorts = active.groupBy(userCol).agg(min(col("week")).as("cohort_week"))
    active.join(cohorts, userCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
}
