package graft

import graft.ops.Prefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property tests for the two-phase distributed prefix sum — the
  * primitive behind the declared seq_pack / quality_filter plans and
  * the sweep-line range join.
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // deterministic LCG (no external randomness in tests)
  private var s = 7L
  private def next(mod: Int): Long = {
    s = s * 6364136223846793005L + 1442695040888963407L
    math.abs(s % mod).toLong
  }

  test("withOffsets + per-partition window equals the single-partition running sum") {
    for (trial <- 0 until 4) {
      val n = 50 + trial * 37
      val parts = 1 + trial * 3
      val rows = (0 until n).map(i => (i.toLong, next(100) - 20)) // incl. negatives
      val df = rows.toDF("k", "w")
      val (base, total) = Prefix.withOffsets(df, Seq(col("k")), col("w"), parts)
      val wp = Window.partitionBy(col("_pid")).orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = base
        .withColumn("run", col("_offset") + sum(col("w")).over(wp))
        .select(col("k"), col("run")).as[(Long, Long)].collect().toMap
      var acc = 0L
      rows.sortBy(_._1).foreach { case (k, w) =>
        acc += w
        assert(got(k) === acc, s"trial $trial k=$k parts=$parts")
      }
      assert(total === rows.map(_._2).sum)
    }
  }

  test("withOffsets on empty and single-row inputs") {
    val (e, totalE) = Prefix.withOffsets(
      Seq.empty[(Long, Long)].toDF("k", "w"), Seq(col("k")), col("w"), 4)
    assert(e.count() === 0 && totalE === 0L)
    val (one, totalOne) = Prefix.withOffsets(
      Seq((5L, 9L)).toDF("k", "w"), Seq(col("k")), col("w"), 4)
    assert(one.select("_offset").as[Long].head() === 0L && totalOne === 9L)
  }
}
