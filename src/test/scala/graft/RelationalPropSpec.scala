package graft

import graft.ops.Relational
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the silver cleaning stage (SURVEY §5.3): adversarial
  * generated rows (NaN, infinities, negatives, nulls, boundary values)
  * rather than the well-formed fixture distribution. Uses raw ScalaCheck
  * generators with fixed seeds (the scalatest-plus bridge is not among
  * the pinned offline deps).
  */
class RelationalPropSpec extends SparkSpec {

  /** Evaluate `body` on `n` deterministic samples of `gen`. */
  private def forAll[T](gen: Gen[T], n: Int = 8)(body: T => Unit): Unit = {
    var seed = Seed(42L)
    var checked = 0
    while (checked < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => body(v); checked += 1 }
      seed = seed.next
    }
  }

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", LongType),
    StructField("l_quantity", DoubleType, nullable = true),
    StructField("l_extendedprice", DoubleType, nullable = true),
    StructField("l_discount", DoubleType, nullable = true),
    StructField("l_tax", DoubleType, nullable = true),
    StructField("l_shipdate", TimestampNTZType, nullable = true)))

  private val adversarialDouble: Gen[java.lang.Double] = Gen.frequency(
    5 -> Gen.choose(-100.0, 100.0).map(Double.box),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, 1.0, 50.0, Double.MinPositiveValue).map(Double.box),
    1 -> Gen.const(null.asInstanceOf[java.lang.Double]))

  private val rowGen: Gen[Row] = for {
    ok <- Gen.choose(0L, 1000L)
    ln <- Gen.choose(1L, 7L)
    q <- adversarialDouble; ep <- adversarialDouble
    d <- adversarialDouble; t <- adversarialDouble
  } yield Row(ok, ln, q, ep, d, t,
    java.time.LocalDateTime.of(2024, 1, 1 + (ok % 28).toInt, 0, 0))

  test("silver filter soundness on adversarial rows: survivors satisfy every predicate") {
    forAll(Gen.listOfN(200, rowGen)) { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val out = Relational.silverStage(df).collect()
      out.foreach { r =>
        val q = r.getAs[Double]("l_quantity")
        val ep = r.getAs[Double]("l_extendedprice")
        val d = r.getAs[Double]("l_discount")
        val t = r.getAs[Double]("l_tax")
        assert(q > 0 && q < 50 && ep > 0 && q < ep)
        assert(d >= 0 && d <= 1 && t >= 0)
        // NaN never survives a comparison-based filter
        assert(!q.isNaN && !ep.isNaN && !d.isNaN && !t.isNaN)
        // derived columns honor their definitions on survivors
        assert(r.getAs[Double]("revenue") === ep * (1.0 - d))
        assert(r.getAs[Double]("charge") === ep * (1.0 - d) * (1.0 + t))
      }
      // subset property: cleaning never invents rows
      assert(out.length <= rows.length)
    }
  }

  test("filter composition: chained filters equal the single conjunctive filter") {
    forAll(Gen.listOfN(150, rowGen)) { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val chained = Relational.silverFilter(Relational.silverCast(df))
      val conjunctive = Relational.silverCast(df).filter(
        col("l_quantity") > 0 && col("l_extendedprice") > 0 &&
          col("l_discount") >= 0 && col("l_discount") <= 1 &&
          col("l_tax") >= 0 && col("l_quantity") < col("l_extendedprice") &&
          col("l_quantity") < 50)
      assert(chained.count() === conjunctive.count())
      assert(chained.exceptAll(conjunctive).count() === 0)
    }
  }
}
