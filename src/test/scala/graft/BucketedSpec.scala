package graft

import graft.pipeline.Bucketed
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle and matches the plain join") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    // force the sort-merge path (at real scale both sides are too big to
    // broadcast anyway — this models the 100 TB plan on tiny fixtures)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val b = new Bucketed(spark, sfTiny, buckets = 4)
      b.writeBucketed()
      val joined = b.joinRevenue()

      // bucketed scans report HashPartitioning(key, n): the join and the
      // groupBy(o_orderstatus)'s partial agg need no hash shuffle below
      // the final agg — the only hash exchange is on o_orderstatus
      val plan = joined.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning\\(([a-z_]+)".r
        .findAllMatchIn(plan).map(_.group(1)).toList
      assert(shuffles.forall(_.startsWith("o_orderstatus")),
        s"unexpected shuffle keys $shuffles in:\n$plan")

      // value parity with the unbucketed formulation
      val plain = Tables.lineitem(spark, sfTiny)
        .join(Tables.orders(spark, sfTiny), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("lines"), Det.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderstatus"))
      assert(joined.collect().toSeq === plain.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
