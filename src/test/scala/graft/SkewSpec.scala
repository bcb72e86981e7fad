package graft

import graft.ops.{Aggregates, Skew}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sfTiny).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfTiny).select("o_orderkey", "o_totalprice")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("declared skew_join_salted equals the plain-join rollup") {
    val got = Skew.skewJoinSalted(spark, sfTiny).collect().toSeq
    val plain = Tables.events(spark, sfTiny).select(col("user_id"), col("value"))
      .join(Tables.customer(spark, sfTiny)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("events"), Det.dsum(col("value")).as("total_value"))
      .orderBy(col("c_mktsegment")).collect().toSeq
    assert(got === plain)
    // a different salt count must not change the result
    assert(Skew.skewJoinSalted(spark, sfTiny, salt = 3).collect().toSeq === plain)
  }

  test("salted aggregation merges to the exact result for algebraic aggs") {
    val ev = Tables.events(spark, sfTiny)
    val exact = ev.groupBy(col("event_type").as("_k"))
      .agg(count(lit(1)).as("agg"))
    val salted = Skew.saltedAgg(ev, col("event_type"), 8,
      partial = c => count(c), merge = c => sum(c), valueCol = lit(1))
    assert(salted.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(salted).count() === 0)
  }

  test("approx_stats: banded self-verification holds and exact anchors match the exact agg") {
    val approx = Aggregates.approxStats(spark, sfTiny).cache()
    // every sketch verdict must be TRUE (the oracle expects literal TRUE)
    assert(approx.filter(!col("users_within_5pct") ||
      !col("p50_in_band") || !col("p95_in_band")).count() === 0)
    // the exact anchor columns really are exact
    val exact = Aggregates.eventTypeStats(spark, sfTiny)
      .select(col("event_type"), col("distinct_users").as("e_users"))
    assert(approx.join(exact, "event_type")
      .filter(col("distinct_users") =!= col("e_users")).count() === 0)
    approx.unpersist()
  }
}
