package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which item pairs appear together
  * in the same order more often than `minSupport` times? The first stage
  * of association-rule mining (Agrawal & Srikant, VLDB'94 — the frequent
  * 2-itemsets), and the same inverted-index discipline as the dedup
  * family: the naive formulation is a lineitem SELF-JOIN on orderkey —
  * at 100 TB, a second full scan+shuffle of the fact table and a
  * quadratic blowup on any hot order.
  *
  * Plan shape here: ONE shuffle of (orderkey, partkey) gathers each
  * order's distinct item list; oversized baskets (> maxBasket) are
  * dropped whole — the skew guard: a pathological 10⁵-item basket would
  * otherwise expand to 10¹⁰ pairs ([[Dedup.ngramPairs]]'s maxDf bound,
  * same reasoning); pairs expand with two chained codegen'd explodes
  * (no self-join — Catalyst cannot reuse the exchange across join-side
  * aliases) and count with a partial+final agg on the (a, b) key. The
  * pair space is bounded by Σ basket²  ≤ maxBasket · Σ basket — linear
  * in the fact table with a constant the caller controls.
  */
object Basket {

  /** (item_a, item_b, n_orders) pairs, item_a < item_b, co-occurring in
    * ≥ `minSupport` baskets. `items` = (basket_key, item) rows;
    * multiplicity within a basket is ignored (array_distinct).
    */
  def pairCounts(items: DataFrame, basketCol: String, itemCol: String,
                 minSupport: Long, maxBasket: Int = 10000): DataFrame =
    basketLists(items, basketCol, itemCol)
      .filter(size(col("its")).between(2, maxBasket))
      .select(explode(col("its")).as("a"), col("its"))
      .select(col("a"), explode(col("its")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a").as("item_a"), col("b").as("item_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
      .orderBy(col("item_a"), col("item_b"))

  /** Distinct-item basket lists shared by [[pairCounts]] and
    * [[basketsDropped]]: one shuffle of (basket_key, item).
    */
  private def basketLists(items: DataFrame, basketCol: String,
                          itemCol: String): DataFrame =
    items
      .groupBy(col(basketCol))
      .agg(array_sort(collect_set(col(itemCol))).as("its"))

  /** Audit twin of [[pairCounts]]'s maxBasket guard: the baskets it
    * drops whole, with their distinct-item count. Empty output =
    * nothing was suppressed. Counts only — item lists never leave the
    * aggregation.
    */
  def basketsDropped(items: DataFrame, basketCol: String, itemCol: String,
                     maxBasket: Int = 10000): DataFrame =
    basketLists(items, basketCol, itemCol)
      .select(col(basketCol), size(col("its")).as("n_items"))
      .filter(col("n_items") > maxBasket)
      .orderBy(col("n_items").desc, col(basketCol))

  /** Declared query: part pairs co-purchased in ≥ 2 orders. */
  def copurchaseQuery(spark: SparkSession, sfDir: String,
                      minSupport: Long = 2): DataFrame =
    pairCounts(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSupport)
}
