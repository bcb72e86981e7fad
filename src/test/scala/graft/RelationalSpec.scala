package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("bronze_ingest derives calendar fields consistent with ts") {
    val df = Relational.bronzeIngest(spark, sfTiny)
    assert(df.count() === 1000)
    val bad = df.filter(
      col("month") < 1 || col("month") > 12 ||
      col("day") < 1 || col("day") > 31 ||
      col("hour") < 0 || col("hour") > 23).count()
    assert(bad === 0)
  }

  test("silver_clean output satisfies every predicate (filter soundness)") {
    val df = Relational.silverClean(spark, sfTiny).cache()
    val violations = df.filter(
      !(col("l_quantity") > 0) || !(col("l_extendedprice") > 0) ||
      !(col("l_discount") >= 0 && col("l_discount") <= 1) ||
      !(col("l_tax") >= 0) ||
      !(col("l_quantity") < col("l_extendedprice")) ||
      !(col("l_quantity") < 50)).count()
    assert(violations === 0)
    // derived columns match their definition row-by-row
    val derivedBad = df.filter(
      col("revenue") =!= col("l_extendedprice") * (lit(1.0) - col("l_discount")) ||
      col("charge") =!= col("revenue") * (lit(1.0) + col("l_tax"))).count()
    assert(derivedBad === 0)
    df.unpersist()
  }

  test("silver_clean is a subset of the source (no row invention)") {
    val src = Tables.lineitem(spark, sfTiny).count()
    val out = Relational.silverClean(spark, sfTiny).count()
    assert(out <= src && out > 0)
  }

  test("filter composition == conjunctive filter") {
    val li = Tables.lineitem(spark, sfTiny)
    val composed = li.filter(col("l_quantity") > 0).filter(col("l_tax") >= 0).count()
    val conjunctive = li.filter(col("l_quantity") > 0 && col("l_tax") >= 0).count()
    assert(composed === conjunctive)
  }
}
