package graft

import graft.ops.{Basket, Profile, Sketches, TimeSeries}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Planted-data gates for the profiling / anomaly / basket / sketch
  * additions: anomaly_days, column_profile, copurchase_pairs,
  * sketch_distinct_rollup.
  */
class ProfileBasketSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int): Timestamp =
    Timestamp.valueOf(f"2025-03-$day%02d 00:${i % 60}%02d:00")

  test("anomalyDays flags a 3-sigma spike and nothing else") {
    // type a: 9 days × 5 events + 1 day × 50 events → spike is 3σ out;
    // quiet days sit at 0.33σ. type b: flat → σ=0, nothing flagged.
    val rows =
      (for (d <- 1 to 10; i <- 1 to (if (d == 10) 50 else 5))
        yield ("a", ts(d, i))) ++
      (for (d <- 1 to 6; i <- 1 to 7) yield ("b", ts(d, i)))
    val ev = rows.toDF("event_type", "ts")
    val out = TimeSeries.anomalyDays(ev).collect()
    val flagged = out.filter(_.getBoolean(3))
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)))
    assert(flagged.toSeq == Seq(("a", "2025-03-10")))
    assert(out.length == 16)
  }

  test("anomalyDays: exactly-2-sigma deviation is NOT an anomaly (strict >)") {
    // 4 equal days + 1 outlier puts the outlier at exactly 2σ for ANY
    // outlier size (dev = 0.8(x−b), σ = 0.4|x−b|) — the boundary case.
    val rows = for (d <- 1 to 5; i <- 1 to (if (d == 5) 50 else 5))
      yield ("a", ts(d, i))
    val out = TimeSeries.anomalyDays(rows.toDF("event_type", "ts")).collect()
    assert(out.forall(!_.getBoolean(3)))
  }

  test("profile counts rows, nulls, and distincts per column in one scan") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "y"), (2L, null), (null, "y"), (null, null)
    ).toDF("k", "v")
    val out = Profile.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("k") == ((5L, 2L, 2L)))
    assert(out("v") == ((5L, 2L, 2L)))
  }

  test("lineitem profile: one parquet scan feeds all 11 columns; approx twin within 5%") {
    val exact = Profile.lineitemProfile(spark, sfTiny)
    // count scans on the optimized logical plan (AQE wraps the physical
    // tree, hiding FileSourceScanExec from a plain collect)
    val scans = exact.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.length == 1, "exact profile must read the table once")
    val e = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val a = Profile.profileApprox(
      Tables.lineitem(spark, sfTiny),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    e.foreach { case (c, exactN) =>
      assert(math.abs(a(c) - exactN) <= math.max(2L, (exactN * 0.05).toLong),
        s"approx distinct for $c: ${a(c)} vs exact $exactN")
    }
  }

  test("basket pairCounts: support threshold, ordering, multiplicity, skew guard") {
    val items = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 2L), // duplicate (order,item) ignored
      (30L, 1L), (30L, 2L), (30L, 4L),
      (40L, 3L)                        // singleton basket → no pairs
    ).toDF("o", "it")
    val out = Basket.pairCounts(items, "o", "it", minSupport = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L)))
    // a basket over maxBasket contributes nothing (skew bomb dropped whole)
    val big = (1 to 12).map(i => (99L, i.toLong)).toDF("o", "it")
    assert(Basket.pairCounts(big, "o", "it", 1, maxBasket = 10).count() == 0)
    // ...and the audit twin reports exactly what was suppressed
    val dropped = Basket.basketsDropped(big, "o", "it", maxBasket = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(dropped.toSeq === Seq((99L, 12)))
    assert(Basket.basketsDropped(big, "o", "it", maxBasket = 12).isEmpty)
  }

  test("rollingDistinctUsers counts trailing-window users, clamped to last day") {
    // u1 active day 1; u2 active days 1 and 3; u3 active day 9.
    // 7-day windows: day1→{u1,u2}, days2-3→{u1,u2}, ... day8 (u1/u2 from
    // day3 window? day 3 covers days 3..9) etc.
    val ev = Seq(
      (1L, ts(1, 1)), (2L, ts(1, 2)), (2L, ts(3, 1)), (3L, ts(9, 1))
    ).toDF("user_id", "ts")
    val out = graft.ops.TimeSeries.rollingDistinctUsers(ev).collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    assert(out("2025-03-01") == 2)  // u1, u2 (both day 1)
    assert(out("2025-03-07") == 2)  // day-1 activity still visible
    assert(out("2025-03-08") == 1)  // only u2's day-3 activity remains
    assert(out("2025-03-09") == 2)  // u2 (day 3) + u3 (day 9)
    assert(!out.contains("2025-03-10"), "clamped at the last observed day")
    assert(out.size == 9)
  }

  test("sketch-window rolling users matches the exact explode within 5% on observed days") {
    val events = Tables.events(spark, sfSmall)
    val exact = graft.ops.TimeSeries.rollingDistinctUsers(events).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val est = Sketches.rollingDistinctUsersSketch(events).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && est.keySet.subsetOf(exact.keySet))
    est.foreach { case (d, e) =>
      assert(math.abs(e - exact(d)) <= math.max(2.0, exact(d) * 0.05),
        s"rolling estimate off at $d: $e vs exact ${exact(d)}")
    }
  }

  test("groupQuantiles picks exact members at ceil(p*n) with deterministic ties") {
    val df = (1 to 10).map(i => ("a", i.toDouble, i.toLong)) ++
      Seq(("b", 5.0, 100L), ("b", 5.0, 101L), ("b", 7.0, 102L))
    val out = graft.ops.Aggregates.groupQuantilesOf(
      df.toDF("k", "v", "id"), "k", "v", "id",
      Seq("p50" -> 0.5, "p90" -> 0.9)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out("a") == ((10L, 5.0, 9.0)))  // ceil(.5*10)=5th=5, ceil(.9*10)=9th=9
    assert(out("b") == ((3L, 5.0, 7.0)))   // ceil(1.5)=2nd=5.0, ceil(2.7)=3rd=7.0
  }

  test("sketch rollup: self-verification verdicts TRUE; exact anchor matches the exact twin") {
    val out = Sketches.monthlyDistinctUsers(spark, sfSmall).collect()
    assert(out.nonEmpty)
    // every in-query verdict must hold (the oracle expects literal TRUE)
    out.foreach { r =>
      assert(r.getBoolean(4), s"estimate out of band at ${r.get(0)}/${r.get(1)}")
      assert(r.getBoolean(5), s"merge inconsistency at ${r.get(0)}/${r.get(1)}")
    }
    // the exact anchor column really is the exact distinct count
    val anchors = out
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(3)).toMap
    val exact = Sketches.monthlyDistinctUsersExact(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
    assert(anchors === exact)
  }

  test("quantile_histogram_rollup: merged bins equal floor(exact quantile), error < width") {
    val width = 100.0
    val got = Sketches.monthlyValueQuantiles(spark, sfTiny, width).collect()
    assert(got.nonEmpty)
    // exact discrete quantile per (month, p): the smallest value whose
    // rank reaches ceil(p*n) — driver-side over the tiny fixture
    val orders = Tables.orders(spark, sfTiny)
      .select(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_totalprice"))
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (m, vs) => m -> vs.map(_._2).sorted }
    for (r <- got) {
      val m = r.getTimestamp(0)
      val p = r.getDouble(1)
      val vf = r.getDouble(2)
      val vals = orders(m)
      assert(r.getLong(3) === vals.length.toLong, s"n_orders at $m")
      val exactQ = vals(math.ceil(p * vals.length).toInt - 1)
      assert(vf === math.floor(exactQ / width) * width,
        s"($m, $p): value_floor $vf vs exact $exactQ")
      assert(vf <= exactQ && exactQ < vf + width)
    }
    // merge losslessness inside Spark too: daily->month == direct month
    import org.apache.spark.sql.expressions.Window
    val direct = Tables.orders(spark, sfTiny)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        floor(col("o_totalprice") / lit(width)).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"))
    val merged = Sketches.dailyValueHistogram(Tables.orders(spark, sfTiny), width)
      .groupBy(date_trunc("month", col("day")).as("month"), col("bin"))
      .agg(sum(col("n")).as("n"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("quantilesFromState property: floor identity holds on random data, negatives included") {
    // deterministic LCG (the offline dep set has no scalacheck bridge)
    var seed = 0x5DEECE66DL
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    for (round <- 1 to 5) {
      val width = Seq(1.0, 10.0, 100.0)(round % 3)
      val n = 50 + (math.abs(next()) % 200).toInt
      // values in [-500, 1500): crosses zero — floor must round toward
      // negative infinity, not truncate (the bug this test exists for)
      val vals = Seq.fill(n)(math.abs(next() % 2000000) / 1000.0 - 500.0)
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (ts(1 + i % 28, i), v)
      }
      val orders = rows.toDF("o_orderdate", "o_totalprice")
      val got = Sketches.quantilesFromState(
        Sketches.dailyValueHistogram(orders, width), width).collect()
      assert(got.length === 3, "one month, three quantiles")
      val sorted = vals.sorted
      for (r <- got) {
        val p = r.getDouble(1)
        val exactQ = sorted(math.ceil(p * n).toInt - 1)
        assert(r.getDouble(2) === math.floor(exactQ / width) * width,
          s"round $round width $width p $p: ${r.getDouble(2)} vs exact $exactQ")
        assert(r.getLong(3) === n.toLong)
      }
    }
  }
}
