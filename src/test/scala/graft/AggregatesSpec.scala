package graft

import graft.ops.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {

  test("gold_daily_revenue: group keys unique, sums reconcile with source") {
    val df = Aggregates.goldDailyRevenue(spark, sfTiny).cache()
    val n = df.count()
    assert(df.select(col("o_custkey"), col("day")).distinct().count() === n)
    // total of group sums == global sum (both through exact decimals)
    val total = df.agg(sum(col("daily_revenue").cast(Det.Dec))).head.getDecimal(0)
    val expected = Tables.orders(spark, sfTiny)
      .agg(sum(col("o_totalprice").cast(Det.Dec))).head.getDecimal(0)
    assert(total.compareTo(expected) === 0)
    // counts reconcile
    val cnt = df.agg(sum(col("order_count"))).head.getLong(0)
    assert(cnt === Tables.orders(spark, sfTiny).count())
    df.unpersist()
  }

  test("gold_hourly_demand covers all events exactly once") {
    val df = Aggregates.goldHourlyDemand(spark, sfTiny)
    val total = df.agg(sum(col("event_count"))).head.getLong(0)
    assert(total === Tables.events(spark, sfTiny).count())
  }

  test("sample_limit returns exactly n rows in key order") {
    val rows = Aggregates.sampleLimit(spark, sfTiny, 17).collect()
    assert(rows.length === 17)
    val keys = rows.map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }

  test("rollup_revenue grand total equals detail total") {
    val df = Aggregates.rollupRevenue(spark, sfTiny).cache()
    val grand = df.filter(col("g_status") === 1 && col("g_priority") === 1)
      .select(col("revenue")).head.getDouble(0)
    val detail = df.filter(col("g_status") === 0 && col("g_priority") === 0)
      .agg(sum(col("revenue").cast(Det.Dec)).cast("double")).head.getDouble(0)
    assert(math.abs(grand - detail) < 1e-6)
    df.unpersist()
  }

  test("finished_no_pending: no returned customer has a pending order") {
    val res = Aggregates.finishedNoPending(spark, sfTiny)
    val pending = Tables.orders(spark, sfTiny)
      .filter(col("o_orderstatus") === "P").select(col("o_custkey")).distinct()
    assert(res.join(pending, "o_custkey").count() === 0)
  }

  test("unpivot_metrics: three rows per flag, values reconcile with the wide aggregate") {
    val out = Aggregates.unpivotMetrics(spark, sfTiny).collect()
    val flags = out.map(_.getString(0)).distinct
    assert(out.length == flags.length * 3)
    assert(out.map(_.getString(1)).toSet ==
      Set("sum_qty", "sum_price", "sum_disc"))
    val qty = out.filter(r => r.getString(1) == "sum_qty")
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val wide = Tables.lineitem(spark, sfTiny).groupBy(col("l_returnflag"))
      .agg(graft.Det.dsum(col("l_quantity")).as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(qty == wide)
  }
}
