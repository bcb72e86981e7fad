package graft

import graft.plans.GroupedTopK
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("custom GroupedTopK operator: correct top-k per group, custom exec in the plan") {
    val orders = Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val k = 3
    val topk = GroupedTopK.of(orders, Seq("o_orderpriority"), "o_totalprice", k)

    // the custom physical operator actually planned (nodeName strips the
    // Exec suffix) with Catalyst-inserted clustering on the group key
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), s"custom exec missing:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      "requiredChildDistribution not honored")

    val got = topk.select("o_orderpriority", "o_totalprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.toSeq).toMap

    // truth: per group, the k largest values (multiset, tie-agnostic)
    val truth = orders.select("o_orderpriority", "o_totalprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.reverse.take(k).toSeq).toMap

    assert(got.keySet === truth.keySet)
    truth.foreach { case (g, vals) =>
      assert(got(g) === vals, s"group $g")
    }
  }

  test("GroupedTopK with empty group list = global top-k") {
    val li = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    val topk = GroupedTopK.of(li, Seq("l_returnflag"), "l_extendedprice", 5)
    // wrong column should throw a clear error
    intercept[IllegalArgumentException] {
      GroupedTopK.of(li, Seq("nope"), "l_extendedprice", 5).collect()
    }
    assert(topk.count() > 0)
  }
}
