package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Structural invariants of the end-to-end write-path queries (the DuckDB
  * oracle checks exact values at sf0.01; this pins the semantics the
  * oracle encodes, so a drift shows up as a named assertion, not a hash
  * mismatch).
  */
class WriteQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String): Array[Row] =
    Registry.queries(name)(spark, sf).collect()

  test("q_merge_upsert: MERGE rewrites matched keys, inserts new, delete prunes") {
    val rows = run("q_merge_upsert")
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // updated keys (≡0 mod 30) surface under the MERGE's own status
    assert(byStatus.contains("U"), s"updated rows missing: $byStatus")
    // inserted keys (old+1) surface under the insert status
    assert(byStatus.contains("N"), s"inserted rows missing: $byStatus")
    // updated rows' custkey was shifted by 1e6 — their sum dwarfs count*maxCust
    val uRow = rows.find(_.getString(0) == "U").get
    assert(uRow.getLong(2) > uRow.getLong(1) * 1000000L,
      "U rows should carry the +1000000 custkey shift")
  }

  test("q_changelog_rows: feed is exactly insert+delete with delete ⊆ slices") {
    val rows = run("q_changelog_rows")
    assert(rows.map(_.getString(0)).toSeq == Seq("delete", "insert"))
    val ins = rows.find(_.getString(0) == "insert").get.getLong(1)
    val sliceB = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderkey % 10 = 1").count()
    assert(ins == sliceB, s"insert rows $ins != appended slice $sliceB")
  }

  test("q_time_travel: pinned read equals post-rollback read") {
    val rows = run("q_time_travel").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("1_pinned", "2_overwritten", "3_rolled_back"))
    assert(rows("1_pinned") == rows("3_rolled_back"),
      "rollback must restore the snapshot-1 state exactly")
    assert(rows("1_pinned") != rows("2_overwritten"),
      "overwrite must actually change the current state")
  }

  test("q_row_delta: deletion-only keys vanish, same-commit replacements survive") {
    val rows = run("q_row_delta")
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/orders.parquet")
    val n60 = docs.filter("o_orderkey % 60 = 0").count()
    val n30 = docs.filter("o_orderkey % 30 = 0").count()
    // replacements: exactly the %60 keys, alive despite being in the
    // delete-key set (sequence scoping exempts same-commit appends)
    assert(byStatus.getOrElse("R", 0L) == n60, s"$byStatus vs n60=$n60")
    // deletion-only keys (%30 minus %60) are GONE: total row math
    val sliceA = docs.filter("o_orderkey % 10 = 0").count()
    val n40 = docs.filter("o_orderkey % 40 = 0").count()
    assert(rows.map(_.getLong(1)).sum == sliceA - n30 + n60 + n40)
  }

  test("q_wap_publish: staged rows invisible until publish, then exact") {
    val rows = run("q_wap_publish").map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    val sliceA = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderkey % 10 = 0").count()
    val sliceB = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderkey % 10 = 1").count()
    assert(rows("1_staged_invisible") == sliceA)
    assert(rows("2_published") == sliceA + sliceB)
  }

  test("q_branch_isolation: branch commit leaves main untouched") {
    val rows = run("q_branch_isolation").map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(rows("1_main") < rows("2_branch"),
      s"branch head must hold main's rows plus its own: $rows")
  }

  test("q_compact_roundtrip: logical state preserved, replace feed empty") {
    val rows = run("q_compact_roundtrip").map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    assert(rows("2_replace_feed") == 0L,
      "a physical-only replace commit must contribute nothing to the feed")
    assert(rows("1_data") > 0L)
  }

  test("q_partition_evolution: probe across mixed layouts is exact") {
    val rows = run("q_partition_evolution").map(r =>
      r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/orders.parquet")
    val want = docs.filter(
      "(o_orderkey % 10 = 0 OR o_orderkey % 10 = 1) AND o_orderstatus = 'F'")
      .count()
    assert(rows("2_status_f") == want,
      s"mixed-layout partition probe must be exact: ${rows("2_status_f")} != $want")
    assert(rows("2_status_f") < rows("1_all"))
  }

  test("q_schema_evolution: old files read null note, renamed col carries data") {
    val rows = run("q_schema_evolution")
    val byNote = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val sliceA = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderkey % 10 = 0").count()
    // '-' = the pre-evolution file generation, projected null o_note
    assert(byNote("-") == sliceA, s"old-generation rows ${byNote("-")} != $sliceA")
    // renamed cust_id still sums real data for the old generation
    val dash = rows.find(_.getString(0) == "-").get
    assert(dash.getLong(2) > 0L, "cust_id must read old o_custkey data by field id")
    // widened o_rank: new generation carries values beyond Int range
    val newGen = rows.filter(_.getString(0) != "-")
    assert(newGen.nonEmpty && newGen.map(_.getLong(3)).sum > Int.MaxValue.toLong,
      "widened o_rank must hold post-widen long values")
  }
}
