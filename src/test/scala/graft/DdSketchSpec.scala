package graft

import graft.functions.DdSketch
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Properties of the log-binned mergeable quantile sketch — the
  * guarantees the banded oracle of `quantile_sketch_rollup` relies on,
  * checked directly: relative-error bound at every probed rank,
  * merge ≡ direct (lossless state addition), bounded state on a
  * heavy-tailed domain where the fixed-width histogram explodes, and
  * collapse behavior at a forced tiny cap.
  */
class DdSketchSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.01
  private val gamma = DdSketch.gammaOf(alpha)

  /** Deterministic heavy-tailed sample: 12 orders of magnitude,
    * log-uniform-ish (x = 10^(6·i/n − 3) scaled), no randomness.
    */
  private def heavyTail(n: Int): Seq[Double] =
    (0 until n).map(i => StrictMath.pow(10.0, 9.0 * i / n - 3.0))

  private def exactAtRank(xs: Seq[Double], p: Double): Double = {
    val sorted = xs.sorted
    sorted(math.ceil(p * xs.size).toInt - 1)
  }

  test("readoff is within relative alpha of the exact order statistic on a heavy-tailed domain") {
    val xs = heavyTail(5000)
    val df = xs.toDF("v").withColumn("k", lit(1))
    val state = df.groupBy($"k")
      .agg(DdSketch.sketch(spark, $"v", alpha).as("sk"))
      .select($"k", explode($"sk").as("cell"))
      .select($"k", $"cell.bin".as("bin"), $"cell.n".as("n"))
    val ps = Seq(0.01, 0.1, 0.5, 0.9, 0.99, 0.999)
    val est = Sketches.ddQuantilesFromBinned(state, "k", alpha, ps, "n_total")
      .select($"p", $"est").as[(Double, Double)].collect().toMap
    ps.foreach { p =>
      val exact = exactAtRank(xs, p)
      assert(math.abs(est(p) - exact) <= alpha * exact * (1 + 1e-9),
        s"p=$p est=${est(p)} exact=$exact exceeds relative alpha=$alpha")
    }
    // the heavy-tailed state bound that is the operator's point: 12
    // orders of magnitude in ~log(range)/log(gamma) bins, where the
    // fixed-width histogram (width chosen for the tail) would need
    // ~value_range/width ≈ 10^9 cells for the same floor precision
    val bins = state.count()
    assert(bins <= math.ceil(StrictMath.log(1e12) / StrictMath.log(gamma)) + 2,
      s"state has $bins bins — exceeds the log-bin bound")
    assert(bins < 1500, s"state has $bins bins — not a sketch any more")
  }

  test("daily->monthly merge is lossless: merged state equals the directly-built sketch") {
    val xs = heavyTail(2000)
    // split the same data arbitrarily into 7 'days' of one 'month'
    val df = xs.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("day", "v")
    val merged = df.groupBy($"day")
      .agg(DdSketch.sketch(spark, $"v", alpha).as("sk"))
      .select(explode($"sk").as("cell"))
      .groupBy($"cell.bin".as("bin")).agg(sum($"cell.n").as("n"))
      .as[(Int, Long)].collect().toMap
    val direct = df.agg(DdSketch.sketch(spark, $"v", alpha).as("sk"))
      .select(explode($"sk").as("cell"))
      .select($"cell.bin".as("bin"), $"cell.n".as("n"))
      .as[(Int, Long)].collect().toMap
    assert(merged === direct, "bin-count addition must be lossless")
  }

  test("non-positive values collect in the floor bin and read off as 0") {
    val df = Seq(-3.0, 0.0, 2.0, 4.0).toDF("v").withColumn("k", lit(1))
    val state = df.groupBy($"k")
      .agg(DdSketch.sketch(spark, $"v", alpha).as("sk"))
      .select($"k", explode($"sk").as("cell"))
      .select($"k", $"cell.bin".as("bin"), $"cell.n".as("n"))
    val floor = state.filter($"bin" === Int.MinValue)
      .select($"n").as[Long].collect()
    assert(floor.toSeq === Seq(2L))
    val est = Sketches.ddQuantilesFromBinned(state, "k", alpha, Seq(0.25, 0.95), "nt")
      .select($"p", $"est").as[(Double, Double)].collect().toMap
    assert(est(0.25) === 0.0)
    assert(math.abs(est(0.95) - 4.0) <= alpha * 4.0 * (1 + 1e-9))
  }

  test("collapse at a forced tiny cap keeps the buffer bounded and tail quantiles exact-banded") {
    val xs = heavyTail(3000)
    val df = xs.toDF("v").withColumn("k", lit(1))
    val state = df.groupBy($"k")
      .agg(DdSketch.sketch(spark, $"v", alpha, maxBins = 64).as("sk"))
      .select($"k", explode($"sk").as("cell"))
      .select($"k", $"cell.bin".as("bin"), $"cell.n".as("n"))
    assert(state.count() <= 64, "collapse failed to cap the state")
    // the floor coarsened; the TAIL keeps its guarantee (DDSketch §2.3)
    val est = Sketches.ddQuantilesFromBinned(state, "k", alpha, Seq(0.99), "nt")
      .select($"est").as[Double].head()
    val exact = exactAtRank(xs, 0.99)
    assert(math.abs(est - exact) <= alpha * exact * (1 + 1e-9))
  }

  test("the sketch aggregates inside a streaming windowed state store; drained state equals batch") {
    import org.apache.spark.sql.types.TimestampNTZType
    val dir = java.nio.file.Files.createTempDirectory("graft_dd_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"))
    val raw = Tables.rawEventsSchema(spark, s"$sfTiny/events.parquet")
    val maxUs = graft.streaming.EventsStream
      .maxEventMicros(spark, s"$sfTiny/events.parquet")
    val sentinelUs = maxUs + 3L * 3600L * 1000000L
    graft.streaming.EventsStream.appendSentinels(spark, dir.toString, raw,
      Seq((-1L, sentinelUs, -1L, "sentinel", 0.0, "{}")))
    val src = graft.streaming.EventsStream.eventsSource(spark, dir.toString, raw)
    val qName = s"dd_stream_${System.nanoTime()}"
    val q = src.withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"))
      .agg(DdSketch.sketch(spark, $"value", alpha).as("sk"))
      .writeStream.format("memory").queryName(qName)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(qName)
      .filter($"window.start" < timestamp_micros(lit(sentinelUs)))
      .select($"window.start".cast(TimestampNTZType).as("h"),
        explode($"sk").as("cell"))
      .select($"h".cast("string").as("h"), $"cell.bin", $"cell.n")
      .collect().map(_.toSeq).toSet
    spark.catalog.dropTempView(qName)
    // order-independent count-adding merges: the state-store path must
    // build EXACTLY the batch sketch, bin for bin
    val batch = Tables.events(spark, sfTiny)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(DdSketch.sketch(spark, $"value", alpha).as("sk"))
      .select($"h".cast("string").as("h"), explode($"sk").as("cell"))
      .select($"h", $"cell.bin", $"cell.n")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("declared quantile_sketch_rollup: every verdict TRUE on the fixtures") {
    val out = Sketches.quantileSketchRollup(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_alpha"), s"within_alpha false at $r")
      assert(r.getAs[Boolean]("merge_consistent"), s"merge_consistent false at $r")
    }
  }
}
