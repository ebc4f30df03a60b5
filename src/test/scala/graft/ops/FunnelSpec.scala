package graft.ops

import graft.SparkSpec

/** Hand-checkable semantics of the ordered funnel and cohort retention
  * (cross-engine numeric parity is pinned by the q_funnel / q_retention
  * oracles). */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  // (user, ts, type) — ts in arbitrary integral units
  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  test("funnel: order matters — a click before the first view does not count") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full chain
      (2L, 10L, "view"), (2L, 5L, "click"),                         // click too early
      (3L, 10L, "click"), (3L, 20L, "purchase"))                    // never viewed
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0, "view", 2L), (1, "click", 1L), (2, "purchase", 1L)))
  }

  test("funnel: first-touch keeps the earliest qualifying time per level") {
    // user 1 views at 10 and 100; click at 50 qualifies against the
    // EARLIEST view even though a later view follows it
    val events = ev(
      (1L, 100L, "view"), (1L, 10L, "view"), (1L, 50L, "click"))
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("funnel: same-timestamp step counts (ts >= is inclusive)") {
    val events = ev((1L, 10L, "view"), (1L, 10L, "click"))
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("retention: cohorts anchor at first week, offsets count distinct users") {
    val weekNs = 7L * 86400L * 1000000L * 1000L
    // user 1 active weeks 0,1,2; user 2 weeks 0,2; user 3 week 1 only
    val events = Seq(
      (1L, 0L * weekNs), (1L, 1L * weekNs), (1L, 2L * weekNs),
      (2L, 0L * weekNs + 5L), (2L, 2L * weekNs),
      (3L, 1L * weekNs))
      .toDF("user_id", "ts")
    val out = Funnel.weeklyRetention(events, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }

  test("retention: duplicate events within a week count the user once") {
    val events = Seq((1L, 100L), (1L, 200L), (1L, 300L)).toDF("user_id", "ts")
    val out = Funnel.weeklyRetention(events, "user_id", "ts").collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L)
  }
}
