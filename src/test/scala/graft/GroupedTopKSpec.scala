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

  test("partial+final phases: two custom execs around the exchange; shuffle carries partial top-ks") {
    val orders = Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val plan = GroupedTopK.of(orders, Seq("o_orderpriority"), "o_totalprice", 3)
      .queryExecution.executedPlan.toString
    val execs = "GroupedTopK".r.findAllIn(plan).length
    assert(execs >= 2, s"expected partial+final custom execs:\n$plan")
    // the exchange sits between them (final requires clustering)
    assert(plan.indexOf("GroupedTopK") < plan.indexOf("Exchange hashpartitioning"),
      "final phase should be above the exchange")
    assert(plan.lastIndexOf("GroupedTopK") > plan.indexOf("Exchange hashpartitioning"),
      "partial phase should be below the exchange")
  }

  test("bounded-memory flushing (flushGroups=1) still yields exact top-k") {
    val li = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    val k = 4
    // flush after every new group in the partial phase: many epochs,
    // results merged in the final phase — must equal the unflushed truth
    val got = GroupedTopK.of(li, Seq("l_returnflag"), "l_extendedprice", k,
        flushGroups = 1)
      .select("l_returnflag", "l_extendedprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.toSeq).toMap
    val truth = li.select("l_returnflag", "l_extendedprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.reverse.take(k).toSeq).toMap
    assert(got === truth)
  }

  test("GroupedTopK with empty group list = global top-k") {
    val li = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    val topk = GroupedTopK.of(li, Seq("l_returnflag"), "l_extendedprice", 5)
    // wrong column should throw a clear error
    intercept[IllegalArgumentException] {
      GroupedTopK.of(li, Seq("nope"), "l_extendedprice", 5).collect()
    }
    // empty group list is rejected: with no group key neither exec
    // phase requires a distribution, no exchange is inserted, and each
    // partition would emit its own k rows — global top-k belongs to
    // orderBy+limit (TakeOrderedAndProject)
    intercept[IllegalArgumentException] {
      GroupedTopK.of(li, Seq.empty, "l_extendedprice", 5)
    }
    assert(topk.count() > 0)
  }
}
