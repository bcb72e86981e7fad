package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query returns a deterministic DataFrame (explicit ORDER
  * BY on a unique key; aggregated doubles routed through exact decimals,
  * see [[Det]]) and, where SQL-expressible, has a DuckDB oracle in
  * [[oracleSql]] with matching column names and types.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.goldDailyRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bronze_ingest"      -> ((s, d) => Relational.bronzeIngest(s, d)),
    "silver_clean"       -> ((s, d) => Relational.silverClean(s, d)),
    "gold_daily_revenue" -> ((s, d) => Aggregates.goldDailyRevenue(s, d)),
    "gold_hourly_demand" -> ((s, d) => Aggregates.goldHourlyDemand(s, d)),
    "sample_limit"       -> ((s, d) => Aggregates.sampleLimit(s, d)),
    "rollup_revenue"     -> ((s, d) => Aggregates.rollupRevenue(s, d)),
    "finished_no_pending" -> ((s, d) => Aggregates.finishedNoPending(s, d)),
    "event_type_stats"   -> ((s, d) => Aggregates.eventTypeStats(s, d)),
  )

  /** DuckDB-equivalent ANSI SQL per query key (same parquet tables,
    * registered by table name). Column names/ordering aliases match the
    * Spark side exactly — the driver sorts columns by name before hashing.
    */
  def oracleSql: Map[String, String] = Map(
    "bronze_ingest" ->
      """SELECT event_id, user_id, event_type, value,
         CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
         CAST(dayofmonth(ts) AS INTEGER) AS day, CAST(hour(ts) AS INTEGER) AS hour
         FROM events ORDER BY event_id""",
    "silver_clean" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate,
         l_extendedprice * (1.0 - l_discount) AS revenue,
         (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge,
         CAST(year(l_shipdate) AS INTEGER) AS ship_year,
         CAST(month(l_shipdate) AS INTEGER) AS ship_month
         FROM lineitem
         WHERE l_quantity > 0 AND l_extendedprice > 0
           AND l_discount >= 0 AND l_discount <= 1 AND l_tax >= 0
           AND l_quantity < l_extendedprice
           AND l_quantity > 0 AND l_quantity < 50
         ORDER BY l_orderkey, l_linenumber""",
    "gold_daily_revenue" ->
      """SELECT o_custkey, date_trunc('day', o_orderdate) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS daily_revenue,
         COUNT(*) AS order_count,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_order_value
         FROM orders GROUP BY 1, 2 ORDER BY o_custkey, day""",
    "gold_hourly_demand" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
         COUNT(*) AS event_count,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, hour""",
    "sample_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey LIMIT 100""",
    "rollup_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS order_count,
         CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
         CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""",
    "finished_no_pending" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "event_type_stats" ->
      """SELECT event_type,
         COUNT(DISTINCT user_id) AS distinct_users,
         COUNT(*) AS events,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1 ORDER BY event_type""",
  )
}
