package graft.ops

import graft.{Tables, Det}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Star-schema enrichment: joins, JSON extraction, window functions —
  * the relational glue a lakehouse gold layer needs (SURVEY §2b; no
  * reference analog, extension surface).
  *
  * Scale design: dimension tables (region 5 rows, nation 25, customer
  * 150·sf) are explicitly `broadcast()` — the fact-side scan never
  * shuffles for the join. Only the final aggregation shuffles, on the
  * (tiny) group-key space, after map-side partial aggregation.
  */
object Star {

  /** Revenue per region/nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    * region (TPC-H Q5 shape). The fact-fact join lineitem⋈orders shuffles
    * on orderkey (both sides hash-partitioned — at 100 TB this is the one
    * unavoidable shuffle; bucketing both tables on orderkey would remove
    * it, see graft.pipeline.Medallion). customer/nation/region broadcast.
    */
  def starJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, sfDir).select(col("r_regionkey"), col("r_name"))

    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Det.dsum(col("revenue")).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** JSON property extraction over `events.props` (a JSON string like
    * {"k": 87}): scalar path extraction + aggregation. get_json_object is
    * codegen'd; no UDF.
    */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("k_count"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  /** VARIANT semi-structured extraction (round 16, Spark 4's native
    * `VariantType` — the lakehouse semi-structured column type delta
    * ships as `delta.feature.variantType`): `parse_json` parses each
    * props payload ONCE into the binary variant encoding, then every
    * `variant_get` path walks the PARSED value — the
    * parse-once/extract-many shape that beats per-path
    * `get_json_object` re-parsing as soon as a row serves two paths.
    * Typed extraction (`'long'`) casts inside the variant reader;
    * `try_variant_get` on a missing path yields NULL, exercised by
    * the `$.missing` column. Codegen-friendly: both expressions are
    * native Catalyst, no UDFs.
    */
  def variantProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        parse_json(col("props")).as("v"))
      .select(col("event_type"), col("value"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("try_variant_get(v, '$.missing', 'long')").as("m"))
      .groupBy(pmod(col("k"), lit(7L)).as("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        Det.dsum(col("value")).as("value_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(col("m")).as("missing_nonnull"))
      .orderBy(col("k_bucket"))

  /** VARIANT array explode (round 17 — the second half of Spark 4's
    * variant surface after [[variantProps]]' typed path extraction):
    * an ARRAY-bearing JSON payload parses ONCE into the binary
    * variant encoding, then the native `variant_explode` GENERATOR
    * (Catalyst `VariantExplode`, no UDF) unnests it to
    * (pos, key, value) rows — `key` is NULL for array elements (it
    * names object fields only; `key_nonnull` pins that contract) and
    * `value` is itself a VARIANT, cast to BIGINT inside the variant
    * reader. The payload is synthesized from `event_id` arithmetic
    * (element i of event e = e%97 + 7i, e%4+1 elements), so the
    * DuckDB oracle recomputes the whole explode with
    * `unnest(generate_series(...))` — a wrong element, order, or
    * count hash-mismatches. Scale shape: parse + explode are
    * partition-local; the only shuffle is the final 10-bucket agg. */
  def variantExplode(spark: SparkSession, sfDir: String): DataFrame = {
    // `variant_explode` registers as a table-valued GENERATOR (Spark's
    // TableFunctionRegistry), so it lives in the FROM clause via
    // LATERAL — the SQL shape delta documents for variant arrays
    Tables.events(spark, sfDir)
      .withColumn("v", expr(
        "parse_json(to_json(transform(" +
          "sequence(0, cast(event_id % 4 as int)), " +
          "i -> event_id % 97 + i * 7)))"))
      .createOrReplaceTempView("variant_explode_src")
    spark.sql(
      """SELECT CAST(elem % 10 AS BIGINT) AS bucket,
                COUNT(*) AS n,
                SUM(elem) AS elem_sum,
                CAST(MAX(pos) AS BIGINT) AS pos_max,
                COUNT(key) AS key_nonnull
         FROM (SELECT e.event_id, ve.pos, ve.key,
                      CAST(ve.value AS BIGINT) AS elem
               FROM variant_explode_src e,
                    LATERAL variant_explode(e.v) AS ve)
         GROUP BY 1 ORDER BY bucket""")
  }

  /** Window functions: top-3 orders by value per priority class
    * (row_number partitioned by o_orderpriority), plus the priority-level
    * total each row contributes to (a second, unbounded window over the
    * same partition — one shuffle serves both).
    */
  def windowTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrio = Window.partitionBy(col("o_orderpriority"))
    val ranked = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rank_in_priority", row_number().over(ranked))
      .withColumn("priority_revenue",
        sum(col("o_totalprice").cast(Det.Dec)).over(byPrio).cast(DoubleType))
      .filter(col("rank_in_priority") <= 3)
      .select(col("o_orderpriority"), col("rank_in_priority"),
        col("o_orderkey"), col("o_totalprice"), col("priority_revenue"))
      .orderBy(col("o_orderpriority"), col("rank_in_priority"))
  }

  /** Correlated-semantics via anti join: customers with no big-ticket
    * order (left_anti — the NOT EXISTS shape). The filter on the orders
    * side is pushed into the scan; the anti join shuffles only the
    * surviving keys (or broadcasts them when small).
    */
  /** Left-semi join: customers with at least one purchase event —
    * existence check without materializing matches (the dual of
    * [[customersNoBigOrder]]'s left_anti). The events side reduces to a
    * distinct key set before the join.
    */
  def customersWithEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"))
    c.join(e, c("c_custkey") === e("user_id"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  def customersNoBigOrder(spark: SparkSession, sfDir: String,
                          threshold: Double = 350000.0): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > threshold)
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Theta join + date arithmetic: ship-lag distribution for lineitems
    * shipped on/after their order date (the FIXTURES.md
    * o_orderdate <= l_shipdate theta form). The equi key keeps it a hash
    * join; the range predicate is a post-join filter, not a cross join.
    */
  def shipLagStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderdate"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("o_orderdate") <= col("l_shipdate"))
      .withColumn("lag_days",
        datediff(col("l_shipdate").cast(DateType), col("o_orderdate").cast(DateType)))
      .groupBy(col("lag_days"))
      .agg(count(lit(1)).as("lines"))
      .orderBy(col("lag_days"))
  }

  /** Ordered-funnel conversion: per market segment, how many users
    * progressed view → click → purchase, where each stage must follow
    * the previous one in (ts, event_id) order. The canonical
    * product-analytics query a lakehouse gold layer serves.
    *
    * Plan: ONE shuffle+sort of events on user_id drives both stacked
    * window passes (same partitioning/ordering → Catalyst plans two
    * Window operators over a single exchange+sort): pass 1 carries the
    * running first-view timestamp, pass 2 the running first
    * click-after-view; the per-user aggregate then reduces each user to
    * one row BEFORE the (broadcast) customer join, so the join probe
    * side is |users|, not |events|. Stage flags are conditional `min`s
    * — no self-joins, no per-stage scans of the event log.
    */
  def funnelConversion(spark: SparkSession, sfDir: String): DataFrame =
    funnelPerUser(Tables.events(spark, sfDir))
      .join(broadcast(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("users"),
        count(col("first_view")).as("viewed"),
        count(col("first_click")).as("clicked_after_view"),
        count(col("first_purchase")).as("purchased_after_click"))
      .orderBy(col("c_mktsegment"))

  /** Product-line profit per nation and year (TPC-H Q9 shape) over the
    * so-far-unused part/supplier dimensions: lineitem ⋈ part(filtered)
    * ⋈ supplier ⋈ nation ⋈ orders, profit = revenue − cost where cost
    * is proxied by `p_retailprice·l_quantity/100` (the fixture carries
    * no partsupp/supplycost table).
    *
    * Plan: part (pre-filtered on the LIKE predicate BEFORE the join —
    * the filter prunes the build side, not post-join rows), supplier
    * and nation all broadcast; the only shuffle is lineitem ⋈ orders on
    * orderkey + the tiny (nation, year) aggregation. The profit
    * expression is per-row IEEE arithmetic in a fixed order — exact
    * across engines — and the sum goes through the decimal accumulator.
    */
  def supplierProfit(spark: SparkSession, sfDir: String,
                     nameFilter: String = "red"): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, sfDir)
      .filter(col("p_name").contains(nameFilter))
      .select(col("p_partkey"), col("p_retailprice"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("profit_amt",
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
          ((col("p_retailprice") * col("l_quantity")) / lit(100.0)))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(
        graft.Det.dsum(col("profit_amt")).as("profit"),
        count(lit(1)).as("lines"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** Cross-system reconciliation via FULL OUTER join — the audit query
    * that finds keys present on one side only (orders without any
    * events, event traffic from non-ordering users). Both sides
    * collapse to per-key counts FIRST (partial+final agg), so the full
    * outer join runs over |keys|, not |rows|, and both inputs arrive
    * hash-partitioned on the same key — at 100 TB the join itself is
    * the cheap step.
    */
  def orderEventReconcile(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("orders_cnt"))
    val e = Tables.events(spark, sfDir)
      .groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("events_cnt"))
    o.join(e, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("orders_cnt"), lit(0L)).as("orders_cnt"),
        coalesce(col("events_cnt"), lit(0L)).as("events_cnt"),
        when(col("orders_cnt").isNotNull && col("events_cnt").isNotNull, "both")
          .when(col("orders_cnt").isNotNull, "orders_only")
          .otherwise("events_only").as("presence"))
      .orderBy(col("key"))
  }

  /** Per-user funnel timestamps over (user_id, event_id, ts, event_type)
    * rows: first view, first click strictly following a view, first
    * purchase strictly following such a click — "following" meaning
    * later in (ts, event_id) order.
    */
  def funnelPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("fv",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("fc",
        min(when(col("event_type") === "click" && col("fv").isNotNull,
          col("ts"))).over(w))
      .groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "click" && col("fv").isNotNull,
          col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase" && col("fc").isNotNull,
          col("ts"))).as("first_purchase"))
  }
}
