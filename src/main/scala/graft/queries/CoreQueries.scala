package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.ops.{Diff, Health, Overlap, Rollups, SchemaDiff}

/** SURVEY §2.10 query inventory: each query is the relational skeleton of a
  * reference operator (cited per entry) expressed over the driver's parquet
  * testdata, with a DuckDB oracle twin. The same `graft.ops` functions are
  * reused by the Iceberg-metadata engine against files/snapshots/manifests
  * frames.
  */
object CoreQueries {

  // events.ts split points in epoch-MICROS (events span 2024-01..2024-01-30).
  // Spark reads ts as epoch-nanos (nanosAsLong) but DuckDB's parquet reader
  // truncates ns → µs, so both sides compare/emit `ts div 1000` ≡ epoch_us.
  private val TSplit = 1705276800000000L // 2024-01-15T00:00:00Z
  private val T1     = 1704844800000000L // 2024-01-10T00:00:00Z
  private val T2     = 1705708800000000L // 2024-01-20T00:00:00Z
  private val tsUs   = expr("ts div 1000")

  val all: Seq[Q] = Seq(

    // S3/P8/F3 — scan + projection + derived path column
    Q("q_scan_project",
      (s, d) => lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          concat(lit("lineitem/"), col("l_returnflag"), lit("/"),
            col("l_orderkey").cast("string")).as("path_col"),
          col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  'lineitem/' || l_returnflag || '/' || CAST(l_orderkey AS VARCHAR) AS path_col,
             |  l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // P2 — predicate + grouped count (small-file detector skeleton)
    Q("q_filter_small",
      (s, d) => lineitem(s, d)
        .filter(col("l_extendedprice") < 2000)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS cnt
             |FROM lineitem WHERE l_extendedprice < 2000
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // A1 — count/min/max/avg/median/sum
    Q("q_file_stats",
      (s, d) => Health.fileStats(lineitem(s, d), "l_extendedprice"),
      Some("""SELECT count(*) AS cnt,
             |  min(l_extendedprice) AS min_val,
             |  max(l_extendedprice) AS max_val,
             |  round(median(l_extendedprice), 2) AS med_val,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_val
             |FROM lineitem""".stripMargin)),

    // A2 — conditional count per group
    Q("q_cond_count",
      (s, d) => Health.conditionalCount(
          lineitem(s, d), "l_linestatus", col("l_quantity") < 10)
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_small,
             |  count(*) AS cnt_total
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // S4/A4 — per-partition stats
    Q("q_partition_stats",
      (s, d) => Health.partitionStats(
          lineitem(s, d), Seq("l_returnflag", "l_linestatus"),
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_size
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A4/J6 — skew flags vs 2× global average
    Q("q_partition_skew",
      (s, d) => Health.skewFlags(
          lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
            .agg(count(lit(1)).as("cnt")),
          "cnt")
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""WITH g AS (
             |  SELECT l_returnflag, l_linestatus, count(*) AS cnt
             |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
             |SELECT l_returnflag, l_linestatus, cnt,
             |  cnt > 2 * avg(cnt) OVER () AS skewed,
             |  round(avg(cnt) OVER (), 4) AS avg_cnt
             |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A4 — skew ratio
    Q("q_skew_ratio",
      (s, d) => Health.skewRatio(
        lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt")),
        "cnt"),
      Some("""WITH g AS (
             |  SELECT l_returnflag, l_linestatus, count(*) AS cnt
             |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
             |SELECT round(max(cnt) / avg(cnt), 4) AS skew_ratio,
             |  max(cnt) AS max_cnt, count(*) AS n_groups
             |FROM g""".stripMargin)),

    // A3 — content census + conditional sums
    Q("q_manifest_census",
      (s, d) => orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("big_cnt"),
          Health.moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // A5 — per-column null counts/percentages (nulls derived deterministically)
    Q("q_null_rates",
      (s, d) => Health.nullRates(
        events(s, d).select(
          when(col("value") < 5, lit(null)).otherwise(col("value")).as("value_n"),
          when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id")).as("user_n"),
          when(length(col("props")) % 13 === 0, lit(null)).otherwise(col("props")).as("props_n")),
        Seq("props_n", "user_n", "value_n")),
      Some("""WITH b AS (
             |  SELECT CASE WHEN value < 5 THEN NULL ELSE value END AS value_n,
             |         CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS user_n,
             |         CASE WHEN length(props) % 13 = 0 THEN NULL ELSE props END AS props_n
             |  FROM events),
             |u AS (
             |  SELECT 'props_n' AS col_name, CAST(sum(CASE WHEN props_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt, count(*) AS total_cnt FROM b
             |  UNION ALL
             |  SELECT 'user_n', CAST(sum(CASE WHEN user_n IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM b
             |  UNION ALL
             |  SELECT 'value_n', CAST(sum(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM b)
             |SELECT col_name, null_cnt, total_cnt,
             |  round((100.0::DOUBLE * null_cnt) / total_cnt, 4) AS null_pct
             |FROM u ORDER BY col_name""".stripMargin)),

    // A7 — per-column bounds, unpivoted
    Q("q_col_bounds",
      (s, d) => Health.columnBounds(
        lineitem(s, d),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")),
      Some("""SELECT * FROM (
             |  SELECT 'l_discount' AS col_name, min(l_discount) AS min_val, max(l_discount) AS max_val FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', min(l_extendedprice), max(l_extendedprice) FROM lineitem
             |  UNION ALL SELECT 'l_quantity', min(l_quantity), max(l_quantity) FROM lineitem
             |  UNION ALL SELECT 'l_tax', min(l_tax), max(l_tax) FROM lineitem)
             |ORDER BY col_name""".stripMargin)),

    // A6 — per-group share of grand total
    Q("q_col_share",
      (s, d) => Health.columnShare(lineitem(s, d), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag"),
      Some("""WITH g AS (
             |  SELECT l_returnflag, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_dec
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, CAST(sum_dec AS DOUBLE) AS sum_val,
             |  round((100.0::DOUBLE * CAST(sum_dec AS DOUBLE)) / CAST(sum(sum_dec) OVER () AS DOUBLE), 4) AS pct
             |FROM g ORDER BY l_returnflag""".stripMargin)),

    // J1/SO1 — "added" anti-join
    Q("q_diff_added",
      (s, d) => Diff.added(
          events(s, d).filter(tsUs > TSplit),
          events(s, d).filter(tsUs <= TSplit),
          "event_id")
        .select(col("event_id"), tsUs.as("ts_us"), col("value"))
        .orderBy("event_id"),
      Some(s"""SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.value
              |FROM events e
              |WHERE epoch_us(e.ts) > $TSplit
              |  AND e.event_id NOT IN (SELECT event_id FROM events WHERE epoch_us(ts) <= $TSplit)
              |ORDER BY e.event_id""".stripMargin)),

    // J1/SO1 — "deleted" anti-join (reverse)
    Q("q_diff_deleted",
      (s, d) => Diff.deleted(
          events(s, d).filter(tsUs > T2),
          events(s, d).filter(tsUs <= T2),
          "event_id")
        .select(col("event_id"), tsUs.as("ts_us"), col("value"))
        .orderBy("event_id"),
      Some(s"""SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.value
              |FROM events e
              |WHERE epoch_us(e.ts) <= $T2
              |  AND e.event_id NOT IN (SELECT event_id FROM events WHERE epoch_us(ts) > $T2)
              |ORDER BY e.event_id""".stripMargin)),

    // A9 — diff totals + net, single scan
    Q("q_diff_net",
      (s, d) => Diff.netSummary(
        events(s, d),
        tsUs > TSplit,
        tsUs <= TSplit,
        col("value")),
      Some(s"""SELECT
              |  CAST(sum(CASE WHEN epoch_us(ts) > $TSplit THEN 1 ELSE 0 END) AS BIGINT) AS added_cnt,
              |  CAST(sum(CASE WHEN epoch_us(ts) <= $TSplit THEN 1 ELSE 0 END) AS BIGINT) AS deleted_cnt,
              |  CAST(sum(CASE WHEN epoch_us(ts) > $TSplit THEN 1 ELSE 0 END) AS BIGINT)
              |    - CAST(sum(CASE WHEN epoch_us(ts) <= $TSplit THEN 1 ELSE 0 END) AS BIGINT) AS net_cnt,
              |  CAST(sum(CASE WHEN epoch_us(ts) > $TSplit THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS added_sum,
              |  CAST(sum(CASE WHEN epoch_us(ts) <= $TSplit THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS deleted_sum,
              |  CAST(sum(CASE WHEN epoch_us(ts) > $TSplit THEN CAST(value AS DECIMAL(18,2)) END)
              |    - sum(CASE WHEN epoch_us(ts) <= $TSplit THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS net_sum
              |FROM events""".stripMargin)),

    // J4 — exact overlap pair count (theta self-join)
    Q("q_overlap_pairs",
      (s, d) => Overlap.pairCount(
        Overlap.intervals(
          lineitem(s, d).filter(col("l_orderkey") <= 300),
          "l_orderkey", "l_shipdate")),
      Some("""WITH iv AS (
             |  SELECT l_orderkey AS k, min(l_shipdate) AS lo, max(l_shipdate) AS hi
             |  FROM lineitem WHERE l_orderkey <= 300 GROUP BY l_orderkey)
             |SELECT count(*) AS pairs_cnt
             |FROM iv a JOIN iv b
             |  ON a.lo <= b.hi AND b.lo <= a.hi AND a.k < b.k""".stripMargin)),

    // J4/W6 — sweep-line any-overlap boolean
    Q("q_overlap_sweep",
      (s, d) => Overlap.sweep(
          Overlap.intervals(
            lineitem(s, d).filter(col("l_orderkey") <= 300),
            "l_orderkey", "l_shipdate"))
        .orderBy("k"),
      Some("""WITH iv AS (
             |  SELECT l_orderkey AS k, min(l_shipdate) AS lo, max(l_shipdate) AS hi
             |  FROM lineitem WHERE l_orderkey <= 300 GROUP BY l_orderkey),
             |sw AS (
             |  SELECT k, lo,
             |    max(hi) OVER (ORDER BY lo, k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
             |  FROM iv)
             |SELECT k, coalesce(lo <= run_max, false) AS overlapped
             |FROM sw ORDER BY k""".stripMargin)),

    // W1 — recent operations top-5
    Q("q_recent_ops",
      (s, d) => Rollups.topK(
        events(s, d).select(
          col("event_id"), tsUs.as("ts_us"), col("event_type"), col("value")),
        5, col("ts_us").desc, col("event_id")),
      Some("""SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
             |FROM events ORDER BY ts_us DESC, event_id LIMIT 5""".stripMargin)),

    // W2 — stalest top-5
    Q("q_top5_stale",
      (s, d) => Rollups.topK(
        orders(s, d).select("o_orderkey", "o_orderdate", "o_orderstatus"),
        5, col("o_orderdate"), col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderdate, o_orderstatus
             |FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 5""".stripMargin)),

    // W3 — snapshot hogs top-5
    Q("q_top5_hogs",
      (s, d) => Rollups.topK(
        orders(s, d).groupBy("o_custkey").agg(
          count(lit(1)).as("order_cnt"),
          Health.moneySum(col("o_totalprice")).as("sum_price")),
        5, col("order_cnt").desc, col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS order_cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_custkey
             |ORDER BY order_cnt DESC, o_custkey LIMIT 5""".stripMargin)),

    // A10/A11 — namespace rollup with grand total (SQL surface; the
    // DataFrame `rollup` trips Spark 4's ambiguous-self-join detector on
    // this 3-way join, so express the identical plan via spark.sql)
    Q("q_rollup_ns",
      (s, d) => s.sql(
        s"""SELECT r_name, count(*) AS cust_cnt,
           |  count(DISTINCT n_nationkey) AS nation_cnt,
           |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
           |FROM parquet.`$d/region.parquet`
           |JOIN parquet.`$d/nation.parquet` ON n_regionkey = r_regionkey
           |JOIN parquet.`$d/customer.parquet` ON c_nationkey = n_nationkey
           |GROUP BY ROLLUP(r_name)
           |ORDER BY r_name NULLS FIRST""".stripMargin),
      Some("""SELECT r_name, count(*) AS cust_cnt,
             |  CAST(count(DISTINCT n_nationkey) AS BIGINT) AS nation_cnt,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
             |FROM region
             |JOIN nation ON n_regionkey = r_regionkey
             |JOIN customer ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(r_name) ORDER BY r_name NULLS FIRST""".stripMargin)),

    // P7/A11 — format-version census skeleton
    Q("q_version_census",
      (s, d) => orders(s, d).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS cnt
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // A13 — per-group share of total rows
    Q("q_tree_pct",
      (s, d) => Rollups.treePct(
          customer(s, d).join(nation(s, d), col("c_nationkey") === col("n_nationkey")),
          "n_name")
        .orderBy("n_name"),
      Some("""WITH g AS (
             |  SELECT n_name, count(*) AS cnt
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name)
             |SELECT n_name, cnt,
             |  round((100.0::DOUBLE * cnt) / CAST(sum(cnt) OVER () AS DOUBLE), 4) AS pct
             |FROM g ORDER BY n_name""".stripMargin)),

    // W8 — classify vs global average
    Q("q_size_color",
      (s, d) => Health.sizeColor(lineitem(s, d), "l_extendedprice")
        .orderBy("bucket"),
      Some("""WITH st AS (
             |  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
             |  FROM lineitem)
             |SELECT CASE WHEN l_extendedprice <= avg_v * 0.5 THEN 'green'
             |            WHEN l_extendedprice <= avg_v * 1.5 THEN 'yellow'
             |            ELSE 'red' END AS bucket,
             |  count(*) AS cnt
             |FROM lineitem, st GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // J2/W7 — schema-version diff classification
    Q("q_schema_diff",
      (s, d) => SchemaDiff.diff(
          part(s, d).filter(col("p_size") <= 30)
            .select(col("p_partkey"), col("p_brand").as("fname")),
          part(s, d).filter(col("p_size") >= 15)
            .select(col("p_partkey"),
              when(col("p_size") % 2 === 0, upper(col("p_brand")))
                .otherwise(col("p_brand")).as("fname")),
          "p_partkey", "fname")
        .orderBy("p_partkey"),
      Some("""WITH o AS (
             |  SELECT p_partkey, p_brand AS fname FROM part WHERE p_size <= 30),
             |n AS (
             |  SELECT p_partkey,
             |    CASE WHEN p_size % 2 = 0 THEN upper(p_brand) ELSE p_brand END AS fname
             |  FROM part WHERE p_size >= 15)
             |SELECT coalesce(o.p_partkey, n.p_partkey) AS p_partkey,
             |  CASE WHEN o.p_partkey IS NULL THEN 'added'
             |       WHEN n.p_partkey IS NULL THEN 'removed'
             |       WHEN o.fname <> n.fname THEN 'changed'
             |       ELSE 'same' END AS status,
             |  o.fname AS old_attr, n.fname AS new_attr
             |FROM o FULL OUTER JOIN n ON o.p_partkey = n.p_partkey
             |ORDER BY p_partkey""".stripMargin)),

    // J5 — cross-table schema conflicts over a literal field relation
    Q("q_schema_conflict",
      (s, d) => {
        val spark2 = s
        import spark2.implicits._
        SchemaDiff.conflicts(
            Seq(
              ("id", "long"), ("id", "int"), ("name", "string"),
              ("ts", "timestamp"), ("ts", "string"),
              ("amount", "double"), ("amount", "double"))
              .toDF("field_name", "ftype"),
            "field_name", "ftype")
          .orderBy("field_name")
      },
      Some("""WITH f(field_name, ftype) AS (VALUES
             |  ('id','long'), ('id','int'), ('name','string'),
             |  ('ts','timestamp'), ('ts','string'),
             |  ('amount','double'), ('amount','double'))
             |SELECT field_name,
             |  CAST(count(DISTINCT ftype) AS BIGINT) AS n_types,
             |  string_agg(DISTINCT ftype, ',' ORDER BY ftype) AS types
             |FROM f GROUP BY field_name
             |HAVING count(DISTINCT ftype) > 1
             |ORDER BY field_name""".stripMargin)),

    // W10/P5 — freshness buckets vs newest event
    Q("q_freshness",
      (s, d) => Health.freshness(
          events(s, d).select(tsUs.as("ts_us")), "ts_us")
        .orderBy("bucket"),
      Some("""WITH m AS (SELECT max(epoch_us(ts)) AS mx FROM events)
             |SELECT CASE WHEN mx - epoch_us(ts) < 86400000000 THEN 'd1'
             |            WHEN mx - epoch_us(ts) < 604800000000 THEN 'd7'
             |            ELSE 'older' END AS bucket,
             |  count(*) AS cnt
             |FROM events, m GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // SO2 — watch: new ids in (T1,T2] vs (−∞,T1]
    Q("q_watch_new",
      (s, d) => Diff.added(
          events(s, d).filter(tsUs > T1 && tsUs <= T2),
          events(s, d).filter(tsUs <= T1),
          "event_id")
        .select(col("event_id"), tsUs.as("ts_us"))
        .orderBy("event_id"),
      Some(s"""SELECT e.event_id, epoch_us(e.ts) AS ts_us
              |FROM events e
              |WHERE epoch_us(e.ts) > $T1 AND epoch_us(e.ts) <= $T2
              |  AND e.event_id NOT IN (SELECT event_id FROM events WHERE epoch_us(ts) <= $T1)
              |ORDER BY e.event_id""".stripMargin)),

    // F-ext — JSON props parsing (events.props is a JSON object string;
    // SURVEY §7.4): extract k, bucket and aggregate
    Q("q_props_parse",
      (s, d) => events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))
        .orderBy("k_bucket"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
             |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin)),

    // A8 — single-row multi-metric summary
    Q("q_summary",
      (s, d) => {
        val li = lineitem(s, d).agg(
          count(lit(1)).as("li_cnt"),
          countDistinct(col("l_partkey")).as("part_cnt"),
          Health.moneySum(col("l_quantity")).as("sum_qty"),
          Health.moneySum(col("l_extendedprice")).as("sum_price"))
        val o = orders(s, d).agg(
          count(lit(1)).as("order_cnt"),
          countDistinct(col("o_custkey")).as("cust_cnt"))
        li.crossJoin(o)
      },
      Some("""SELECT
             |  (SELECT count(*) FROM lineitem) AS li_cnt,
             |  (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS part_cnt,
             |  (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem) AS sum_qty,
             |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem) AS sum_price,
             |  (SELECT count(*) FROM orders) AS order_cnt,
             |  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS cust_cnt""".stripMargin)),
  )
}
