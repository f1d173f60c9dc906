package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{TableStats, TimeBucketAgg, TypeInference}
import graft.queries.Analytics
import graft.sync.{SyncOps, TypeMapper}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every entry in `queries` has a matching DuckDB `oracleSql` (same
  * column names, same deterministic ORDER BY, floats rounded
  * identically) unless the operator is not SQL-expressible.
  */
object SparkEntry {

  private val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2a sync-engine surface -------------------------------------
    "q_full_sync" -> ((s, d) =>
      SyncOps.fullSnapshot(Tables.orders(s, d), Seq("o_orderkey"))),
    "q_incremental_sync" -> ((s, d) =>
      SyncOps.incremental(Tables.events(s, d), "ts", "2024-01-20 00:00:00",
        Seq("event_id"))),
    "q_upsert_keep_latest" -> ((s, d) =>
      SyncOps.upsertKeepLatest(Tables.events(s, d), Seq("user_id"), "ts", "event_id")
        .select(eventCols.map(col): _*).orderBy("user_id")),
    "q_dedup_keys" -> ((s, d) =>
      SyncOps.dedupKeepLast(Tables.events(s, d), Seq("user_id", "event_type"),
        "ts", "event_id")
        .select(eventCols.map(col): _*).orderBy("user_id", "event_type")),
    "q_merge_incremental" -> ((s, d) => {
      val ev = Tables.events(s, d)
      SyncOps.mergeSlices(
        ev.filter(col("ts") < lit("2024-01-25 00:00:00").cast("timestamp")),
        ev.filter(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp")),
        "ts", Seq("event_id"))
    }),
    "q_time_bucket_agg" -> ((s, d) =>
      TimeBucketAgg.bucketed(Tables.events(s, d), "ts", "10 minutes", Seq("value"))),
    "q_time_bucket_strptime" -> ((s, d) =>
      TimeBucketAgg.bucketedFromVarchar(
        Tables.events(s, d)
          .withColumn("ts_str", date_format(col("ts"), "yyyyMMddHHmmss")),
        "ts_str", "1 hour", Seq("value"))),
    "q_table_stats" -> ((s, d) =>
      TableStats.numericStats(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "q_row_counts" -> ((s, d) => TableStats.rowCounts(s, d, Tables.all)),
    "q_select_limit" -> ((s, d) =>
      Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey").limit(100)),
    "q_type_inference" -> ((s, d) => {
      val withK = Tables.events(s, d)
        .withColumn("k_str", regexp_extract(col("props"), "[0-9]+", 0))
      TypeInference.convertIfNumeric(withK, "k_str")
        .groupBy(col("event_type"))
        .agg(round(avg(col("k_str")), 6).as("k_avg"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "q_filter_range" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_extendedprice").between(1000.0, 5000.0))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_schema_map" -> ((s, d) => {
      val catalog = Seq(
        ("amount", "NUMBER(10,2)"), ("event_time", "DATE"),
        ("flag", "CHAR(1)"), ("id", "NUMBER"), ("name", "VARCHAR2(100)"),
        ("note", "CLOB"), ("updated_at", "TIMESTAMP(6)"))
      s.createDataFrame(
        catalog.map { case (n, t) => (n, t, TypeMapper.mapSourceType(t)) })
        .toDF("column_name", "source_type", "engine_type")
        .orderBy("column_name")
    }),

    // ---- §2b analytics surface ---------------------------------------
    "q1_agg" -> ((s, d) => Analytics.q1Agg(s, d)),
    "q_join_dim" -> ((s, d) => Analytics.joinDim(s, d)),
    "q_multi_join" -> ((s, d) => Analytics.multiJoin(s, d)),
    "q_topk" -> ((s, d) => Analytics.topK(s, d)),
    "q_window_rank" -> ((s, d) => Analytics.windowRank(s, d)),
    "q_window_running" -> ((s, d) => Analytics.windowRunning(s, d)),
    "q_distinct_agg" -> ((s, d) => Analytics.distinctAgg(s, d)),
    "q_semi_anti" -> ((s, d) => Analytics.semiAnti(s, d)),
    "q_pivot" -> ((s, d) => Analytics.pivotStatus(s, d)),
    "q_rollup" -> ((s, d) => Analytics.rollupAgg(s, d)),
    "q_asof_join" -> ((s, d) => Analytics.asofJoin(s, d)),
    "q_events_sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_full_sync" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "q_incremental_sync" ->
      "SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00' ORDER BY ts, event_id",
    "q_upsert_keep_latest" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events e) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_dedup_keys" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT e.*, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events e) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_merge_incremental" ->
      """SELECT * FROM (
        |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        |  UNION ALL
        |  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00') t
        |ORDER BY ts, event_id""".stripMargin,
    "q_time_bucket_agg" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_ts, COUNT(*) AS point_count,
        |  round(AVG(value), 6) AS value_avg, MIN(value) AS value_min, MAX(value) AS value_max
        |FROM events GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,
    "q_time_bucket_strptime" ->
      """SELECT time_bucket(INTERVAL '1 hour', strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S')) AS bucket_ts,
        |  COUNT(*) AS point_count,
        |  round(AVG(value), 6) AS value_avg, MIN(value) AS value_min, MAX(value) AS value_max
        |FROM events GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,
    "q_table_stats" ->
      """SELECT COUNT(*) AS row_count,
        |  MIN(l_quantity) AS l_quantity_min, MAX(l_quantity) AS l_quantity_max, round(AVG(l_quantity), 6) AS l_quantity_avg,
        |  MIN(l_extendedprice) AS l_extendedprice_min, MAX(l_extendedprice) AS l_extendedprice_max, round(AVG(l_extendedprice), 6) AS l_extendedprice_avg,
        |  MIN(l_discount) AS l_discount_min, MAX(l_discount) AS l_discount_max, round(AVG(l_discount), 6) AS l_discount_avg,
        |  MIN(l_tax) AS l_tax_min, MAX(l_tax) AS l_tax_max, round(AVG(l_tax), 6) AS l_tax_avg
        |FROM lineitem""".stripMargin,
    "q_row_counts" ->
      Tables.all.sorted.map(t =>
        s"SELECT '$t' AS table_name, COUNT(*) AS n_rows FROM $t")
        .mkString("", " UNION ALL ", " ORDER BY table_name"),
    "q_select_limit" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey LIMIT 100",
    "q_type_inference" ->
      """SELECT event_type, round(AVG(CAST(regexp_extract(props, '[0-9]+') AS DOUBLE)), 6) AS k_avg, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_filter_range" ->
      "SELECT * FROM lineitem WHERE l_extendedprice BETWEEN 1000 AND 5000 ORDER BY l_orderkey, l_linenumber",
    "q_schema_map" ->
      """SELECT column_name, source_type,
        |  CASE WHEN source_type LIKE '%NUMBER%' THEN 'DOUBLE'
        |       WHEN source_type LIKE '%VARCHAR%' OR source_type LIKE '%CHAR%' THEN 'STRING'
        |       WHEN source_type LIKE '%DATE%' THEN 'TIMESTAMP'
        |       WHEN source_type LIKE '%TIMESTAMP%' THEN 'TIMESTAMP'
        |       ELSE 'STRING' END AS engine_type
        |FROM (VALUES ('amount','NUMBER(10,2)'), ('event_time','DATE'), ('flag','CHAR(1)'),
        |             ('id','NUMBER'), ('name','VARCHAR2(100)'), ('note','CLOB'),
        |             ('updated_at','TIMESTAMP(6)')) t(column_name, source_type)
        |ORDER BY column_name""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(SUM(l_quantity), 2) AS sum_qty,
        |  round(SUM(l_extendedprice), 2) AS sum_base_price,
        |  round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(AVG(l_quantity), 6) AS avg_qty,
        |  round(AVG(l_discount), 6) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_dim" ->
      """SELECT n_name, round(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_multi_join" ->
      """SELECT n_name, round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, c_name, round(SUM(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q_window_rank" ->
      """SELECT c_nationkey, rank_in_nation, c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_nationkey,
        |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rank_in_nation,
        |    c_custkey, c_name, c_acctbal
        |  FROM customer) t
        |WHERE rank_in_nation <= 3 ORDER BY c_nationkey, rank_in_nation""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_semi_anti" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS segment, COUNT(*) AS n FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS segment, COUNT(*) AS n FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) t
        |ORDER BY segment""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |  round(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS finished_value
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, ts, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_events_sessionize" ->
      """SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM events) s) g
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
  )
}
