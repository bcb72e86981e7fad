package graft

import org.apache.spark.sql.functions._

/** Spark 4 `variant_explode` semantics the declared `variant_explode`
  * query (arrays) relies on, plus the halves it doesn't exercise:
  * OBJECT explode emits field names as non-null keys, and the
  * `_outer` form keeps rows whose variant is not explodable.
  */
class VariantExplodeSpec extends SparkSpec {
  import spark.implicits._

  test("array explode: NULL keys, positions dense from 0, values typed through the variant reader") {
    spark.range(3).toDF("id")
      .withColumn("v", expr(
        "parse_json(concat('[', id, ',', id + 10, ']'))"))
      .createOrReplaceTempView("vx_arr")
    val rows = spark.sql(
      """SELECT e.id, ve.pos, ve.key, CAST(ve.value AS BIGINT) AS x
         FROM vx_arr e, LATERAL variant_explode(e.v) ve
         ORDER BY id, pos""").as[(Long, Int, Option[String], Long)]
      .collect().toSeq
    assert(rows.size === 6)
    assert(rows.forall(_._3.isEmpty), "array elements carry NULL key")
    assert(rows.map(_._2).grouped(2).forall(_ == Seq(0, 1)))
    assert(rows.filter(_._1 == 2L).map(_._4) === Seq(2L, 12L))
  }

  test("object explode: field names land as keys, values by field") {
    spark.range(2).toDF("id")
      .withColumn("v", expr(
        """parse_json(concat('{"a":', id, ',"b":', id * 7, '}'))"""))
      .createOrReplaceTempView("vx_obj")
    val rows = spark.sql(
      """SELECT e.id, ve.key, CAST(ve.value AS BIGINT) AS x
         FROM vx_obj e, LATERAL variant_explode(e.v) ve
         ORDER BY id, key""").as[(Long, String, Long)].collect().toSeq
    assert(rows === Seq(
      (0L, "a", 0L), (0L, "b", 0L), (1L, "a", 1L), (1L, "b", 7L)))
  }

  test("variant_explode_outer keeps non-explodable rows; plain explode drops them") {
    // id 0 -> array, id 1 -> scalar (not explodable), id 2 -> empty array
    spark.range(3).toDF("id")
      .withColumn("v", expr(
        """parse_json(CASE id WHEN 0 THEN '[5]' WHEN 1 THEN '42'
                              ELSE '[]' END)"""))
      .createOrReplaceTempView("vx_out")
    val inner = spark.sql(
      """SELECT e.id FROM vx_out e, LATERAL variant_explode(e.v) ve""")
      .as[Long].collect().toSeq
    assert(inner === Seq(0L))
    val outer = spark.sql(
      """SELECT e.id, ve.pos
         FROM vx_out e, LATERAL variant_explode_outer(e.v) ve
         ORDER BY id""").as[(Long, Option[Int])].collect().toSeq
    assert(outer === Seq((0L, Some(0)), (1L, None), (2L, None)))
  }
}
