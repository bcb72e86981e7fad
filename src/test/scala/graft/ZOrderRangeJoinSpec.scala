package graft

import graft.functions.ZOrderKey
import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class ZOrderRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference Morton code (independent of the twiddle). */
  private def mortonRef(a: Int, b: Int): Long = {
    val x = (a ^ Int.MinValue).toLong & 0xFFFFFFFFL
    val y = (b ^ Int.MinValue).toLong & 0xFFFFFFFFL
    var out = 0L
    for (i <- 0 until 32) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
    }
    out ^ Long.MinValue
  }

  test("ZOrderKey matches the bit-by-bit reference, incl. negatives and extremes") {
    val cases = Seq(
      (0, 0), (1, 0), (0, 1), (1, 1), (123456, 654321),
      (-1, 1), (1, -1), (-5, -7),
      (Int.MaxValue, Int.MinValue), (Int.MinValue, Int.MaxValue),
      (Int.MaxValue, Int.MaxValue), (Int.MinValue, Int.MinValue))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrderKey.zorder(spark, col("a"), col("b")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) === mortonRef(a, b), s"($a,$b)")
    }
  }

  test("ZOrderKey codegen and interpreted eval agree (codegen forced, no fallback)") {
    var s = 99L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33).toInt }
    val rows = (0 until 500).map(_ => (next(), next()))
    // forbid the silent interpreter fallback: a janino compile error in
    // doGenCode must FAIL here, not quietly run interpreted (a prior
    // codegen bug hid exactly this way)
    val savedFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val savedFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val viaExpr =
      try rows.toDF("a", "b")
        .select(ZOrderKey.zorder(spark, col("a"), col("b"))).as[Long].collect()
      finally {
        savedFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
          spark.conf.set("spark.sql.codegen.factoryMode", _))
        savedFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
          spark.conf.set("spark.sql.codegen.fallback", _))
      }
    val viaEval = rows.map { case (a, b) =>
      graft.functions.ZOrderKey(
        org.apache.spark.sql.catalyst.expressions.Literal(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b))
        .eval(null).asInstanceOf[Long]
    }
    assert(viaExpr.toSeq === viaEval)
  }

  test("Z-clustering skips files for filters on EITHER dimension; lexicographic only on the leading one") {
    // 64×64 grid clustered into 16 files both ways. The skipping metric:
    // how many files' [min,max] range covers a random point filter —
    // files a scan must open. Lexicographic: b spans everything in every
    // file (all 16 touched); Z-order: ~16×16 quadrants (≈4 touched per
    // dimension). Compare the worst dimension of each layout.
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    def touched(df: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val spans = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min(dim).as("lo"), max(dim).as("hi"))
        .select(((col("hi") - col("lo") + 1) / 64.0).as("cover"))
        .as[Double].collect()
      spans.sum // expected files opened for a uniform point filter × 1
    }
    val lex = grid.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
    val zed = grid
      .withColumn("z", ZOrderKey.zorder(spark, col("a"), col("b")))
      .repartitionByRange(16, col("z")).sortWithinPartitions(col("z")).drop("z")
    val lexWorst = math.max(touched(lex, "a"), touched(lex, "b"))
    val zWorst = math.max(touched(zed, "a"), touched(zed, "b"))
    assert(lexWorst >= 15.0, s"lex should touch ~all files on b: $lexWorst")
    assert(zWorst <= 6.0, s"z should touch ~4 of 16 files per dimension: $zWorst")
  }

  test("bucketized range join equals the naive between-join") {
    val points = (0L until 200L).map(p => p * 7 % 500).toDF("p")
    var s = 7L
    def next(mod: Int): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.abs(s % mod).toLong }
    val ivs = (0 until 100).map { _ => val lo = next(450); (lo, lo + next(80)) }
      .toDF("lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", bucketWidth = 32)
      .select("p", "lo", "hi").as[(Long, Long, Long)].collect().sorted.toSeq
    val want = points.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "lo", "hi").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("sweepActiveCounts equals the naive per-point interval count at every boundary") {
    var s = 31L
    def next(mod: Int): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.abs(s % mod).toLong }
    val ivs = (0 until 300).map { _ => val lo = next(1000); (lo, lo + next(90)) }
    val sweep = RangeJoin.sweepActiveCounts(ivs.toDF("lo", "hi"), "lo", "hi")
      .as[(Long, Long)].collect().toMap
    // at each boundary point, active == naive containment count
    sweep.keys.foreach { b =>
      val naive = ivs.count { case (lo, hi) => b >= lo && b <= hi }.toLong
      assert(sweep(b) === naive, s"boundary $b")
    }
    assert(sweep.values.max > 1L)
  }

  test("range_join_transit day counts are positive and bounded by total lineitems") {
    val df = RangeJoin.inTransitDaily(spark, sfTiny)
    val total = Tables.lineitem(spark, sfTiny).count()
    assert(df.count() > 0)
    assert(df.filter(col("in_transit") <= 0 || col("in_transit") > total).count() === 0)
  }
}
