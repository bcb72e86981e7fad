package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unit gate for the bench harness's error handling: a failed rep must
  * never contribute a "timing" (it measures the failure path, not the
  * query), and a query with zero successful reps must surface its error
  * instead of a number (round-4 verdict, What's wrong #3).
  */
class BenchSpec extends SparkSpec {

  test("measure: failed reps are excluded; all-failed queries report error, not time") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).toDF("x")
    // fails at plan-construction time
    val boomBuild: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("deliberate build failure")
    // builds fine, fails at execution time (count() — via an opaque
    // typed map; a projection-level raise_error would be pruned away)
    val boomExec: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      s.range(1).as[Long].map { _ =>
        throw new RuntimeException("deliberate exec failure"); 0L
      }.toDF("x")
    }
    val (res, errs, loads) = Bench.measure(spark, "unused",
      Seq("good" -> ok, "bad_build" -> boomBuild, "bad_exec" -> boomExec),
      reps = 3)
    val m = res.toMap
    assert(m("good").length === 3 && m("good").forall(_ >= 0.0))
    assert(m("good") === m("good").sorted, "rep times must come back sorted")
    assert(m("bad_build").isEmpty, "failed query must not report timings")
    assert(m("bad_exec").isEmpty, "exec-failed query must not report timings")
    assert(errs("bad_build").contains("deliberate build failure"))
    // the exec error arrives wrapped in Spark's job-failure banner (and
    // is truncated to 160 chars for the JSON line) — presence is the gate
    assert(errs("bad_exec").nonEmpty)
    // output order preserved for the JSON line
    assert(res.map(_._1) === Seq("good", "bad_build", "bad_exec"))
    // one load sample per ATTEMPTED rep, including failed ones
    assert(loads("good").length === 3)
    assert(loads("bad_build").length === 3)
  }

  test("measure: adaptive extra reps trigger on wide spread, respect the cap") {
    // first rep sleeps 600 ms, later reps ~10 ms → spread > 30% of median
    // and > the 100 ms absolute floor, so the adaptive loop must fire
    var calls = 0
    val spiky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      Thread.sleep(if (calls == 1) 600 else 10)
      s.range(1).toDF("x")
    }
    val (res, _, loads) = Bench.measure(spark, "unused",
      Seq("spiky" -> spiky), reps = 3, maxExtraReps = 2)
    // spread stays ~590 ms however many reps run, so the loop must stop
    // at exactly base + maxExtraReps
    assert(res.toMap.apply("spiky").length === 5)
    assert(loads("spiky").length === 5)

    // a tight query must NOT re-rep (sub-100 ms spread floor)
    val flat: (SparkSession, String) => DataFrame =
      (s, _) => { Thread.sleep(5); s.range(1).toDF("x") }
    val (res2, _, _) = Bench.measure(spark, "unused",
      Seq("flat" -> flat), reps = 3, maxExtraReps = 2)
    assert(res2.toMap.apply("flat").length === 3,
      "sub-floor spread must not trigger extra reps")
  }

  /** Valid-JSON gate via Spark's own parser: FAILFAST json read of the
    * single line throws on any malformation, no extra dependency.
    */
  private def parseJson(line: String): DataFrame = {
    import spark.implicits._
    val df = spark.read.option("mode", "FAILFAST").json(Seq(line).toDS)
    df.collect() // force the parse
    df
  }

  test("renderCompact: fits the budget, parses as JSON, accounts for every query") {
    val medians = (1 to 90).map(i => s"query_name_$i" ->
      (if (i % 17 == 0) None else Some(i * 0.037)))
    val line = Bench.renderCompact(medians, 12.345, "/root/testdata/sf0.1",
      reps = 3, loadStart = 1.0, loadEnd = 2.0, nErrors = 5)
    assert(line.length <= 1400, s"over budget: ${line.length}")
    val row = parseJson(line).head()
    def l(name: String): Long = row.getAs[Long](name)
    assert(l("n_queries") === 90)
    val kept = parseJson(line).select("queries.*").schema.length
    assert(kept + l("queries_omitted") === medians.count(_._2.isDefined),
      "kept + omitted must cover every timed query")
    // slowest-first: the kept entries are the most expensive ones
    assert(line.contains("query_name_89"), "slowest queries must survive the trim")
    // r15: per-query min_quiet rides the compact artifact as
    // [median, min_quiet] pairs, still within budget, still JSON
    val quiets = (1 to 90).filter(_ % 17 != 0)
      .map(i => s"query_name_$i" -> i * 0.031).toMap
    val line2 = Bench.renderCompact(medians, 12.345,
      "/root/testdata/sf0.1", reps = 3, loadStart = 1.0, loadEnd = 2.0,
      nErrors = 5, totalMinQuiet = 10.0, quietLoad = 4.0,
      minQuiets = quiets)
    assert(line2.length <= 1400, s"over budget: ${line2.length}")
    val row2 = parseJson(line2).head()
    assert(row2.getAs[String]("queries_format") === "[median,min_quiet]")
    val q89 = parseJson(line2).select("queries.query_name_89").head()
      .getSeq[Double](0)
    assert(q89 === Seq(89 * 0.037, 89 * 0.031).map(v =>
      math.round(v * 100) / 100.0))
    assert(row2.getAs[Double]("total_min_quiet") === 10.0)
  }

  test("renderFull and writeDetail emit parseable JSON with escaped interpolations") {
    val medians = Seq("q_ok" -> Some(0.5), "q_err" -> None)
    val errors = Map("q_err" -> "boom with \"quotes\" and back\\slash")
    val evil = "/tmp/sf\"quoted\\path"
    val full = Bench.renderFull(medians, 0.5, evil, 3, 1.0, 1.0,
      Map("q_ok" -> 0.2), errors)
    assert(parseJson(full).head().getAs[String]("sf") === evil)
    val tmp = java.nio.file.Files.createTempFile("bench_detail", ".json")
    Bench.writeDetail(tmp.toString,
      Seq("q_ok" -> Seq(0.4, 0.5, 0.6), "q_err" -> Seq.empty),
      evil, 3, 1.0, 1.0, errors)
    val detail = java.nio.file.Files.readString(tmp)
    val row = parseJson(detail).head()
    assert(row.getAs[String]("sf") === evil)
    assert(parseJson(detail).select("queries.q_ok.median").head().getDouble(0) === 0.5)
  }

  test("QueryRun quiet statistics: base median is fixed-sample, min_quiet ignores loaded reps, detail carries both") {
    // attempts: (load, time) — 3 base reps then 2 adaptive extras;
    // the contaminated rep (load 12) is the slowest
    val run = Bench.QueryRun("q",
      times = Seq(1.0, 1.1, 1.2, 8.0, 9.0).sorted,
      attempts = Seq(12.0 -> Some(9.0), 2.0 -> Some(1.1), 11.0 -> Some(8.0),
        1.5 -> Some(1.0), 3.9 -> Some(1.2)),
      baseReps = 3)
    // base median = median over FIRST 3 attempts only: (9.0, 1.1, 8.0)
    assert(run.baseMedian === Some(8.0))
    // adaptive median over all 5 sorted times
    assert(run.median === Some(1.2))
    // absolute threshold 4.0: reps at loads {2.0, 1.5, 3.9} qualify
    // (none is attempt #1, so all stay eligible) -> fastest is 1.0
    assert(run.minQuiet(4.0) === Some(1.0))
    // r17: the COLD first attempt is never quiet-eligible — r16's
    // min_quiet printed the 68.5 s cold rep for a 17 s-warm query
    // because only attempt #1 started under threshold
    val coldOnly = Bench.QueryRun("c",
      times = Seq(17.0, 17.5, 68.5).sorted,
      attempts = Seq(1.0 -> Some(68.5), 9.0 -> Some(17.0),
        8.5 -> Some(17.5)),
      baseReps = 3)
    assert(coldOnly.minQuiet(4.0) === None)
    // ...but a LATER quiet rep reports normally
    val warmQuiet = coldOnly.copy(
      attempts = coldOnly.attempts :+ (2.0 -> Some(16.8)),
      times = (coldOnly.times :+ 16.8).sorted)
    assert(warmQuiet.minQuiet(4.0) === Some(16.8))
    // r16: the threshold is ABSOLUTE — no relative calmest+2.0
    // fallback (r15's fallback admitted contaminated reps and printed
    // a 32 s "quiet" value for a 3 s query). No rep under 0.5 ->
    // honest None, and measureRuns' quiet-seek is what makes that rare
    assert(run.minQuiet(0.5) === None)
    // failed attempts never contribute even when quiet
    val failing = Bench.QueryRun("f", Seq.empty,
      Seq(1.0 -> None, 2.0 -> None), 2)
    assert(failing.minQuiet(4.0) === None && failing.baseMedian === None)
    // the rich detail dump is valid JSON carrying the new statistics
    val tmp2 = java.nio.file.Files.createTempFile("bench_detail2", ".json")
    Bench.writeDetailRuns(tmp2.toString, Seq(run), "/sf", 3, 1.0, 1.0,
      Map.empty, 0.4, quietLoad = 4.0)
    val d = parseJson(java.nio.file.Files.readString(tmp2))
    assert(d.select("queries.q.min_quiet").head().getDouble(0) === 1.0)
    assert(d.select("queries.q.base_median").head().getDouble(0) === 8.0)
    assert(d.select("quiet_load").head().getDouble(0) === 4.0)
    // r17: the detail dump carries ATTEMPT-ALIGNED [ext,raw,secs]
    // triples — r16 paired sorted times against attempt-order loads
    // and read as a broken min_quiet. With rawLoads absent, raw==ext.
    val att = d.select("queries.q.attempts").head()
      .getSeq[Seq[Double]](0)
    assert(att.length === 5)
    assert(att.head === Seq(12.0, 12.0, 9.0))
    assert(att(3) === Seq(1.5, 1.5, 1.0))
    assert(d.select("queries.q.attempts_format").head().getString(0)
      === "[ext_load,raw_load,secs]")
  }

  test("minQuietGuarded suppresses loaded-host outliers: a quiet rep past 1.5x base median reads as an honest absence") {
    // the r17 ml_train artifact: the ONLY quiet-eligible attempt was a
    // 19.5 s outlier against a 3.55 s median — the guarded statistic
    // must suppress it (raw keeps it for the detail dump)
    val outlier = Bench.QueryRun("q",
      times = Seq(3.4, 3.55, 3.6, 19.49),
      attempts = Seq((5.0, Some(3.55)), (4.3, Some(3.4)),
        (5.1, Some(3.6)), (3.75, Some(19.49))),
      baseReps = 4)
    assert(outlier.minQuiet(4.0) === Some(19.49))
    assert(outlier.minQuietGuarded(4.0) === None,
      "an outlier quiet rep must suppress, not mislead")
    // a genuine quiet rep under the bound passes through unguarded
    val sane = outlier.copy(attempts = Seq((5.0, Some(3.55)),
      (4.3, Some(3.4)), (3.0, Some(3.2)), (3.75, Some(19.49))),
      times = Seq(3.2, 3.4, 3.55, 19.49))
    assert(sane.minQuietGuarded(4.0) === Some(3.2))
  }

  test("measureRuns subtracts the self-load estimate for quiet gating and keeps raw loads") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).toDF("x")
    val (runs, errs) = Bench.measureRuns(spark, "unused",
      Seq("g" -> ok), reps = 3,
      // estimator claims the bench itself generates huge load: external
      // load must clamp at 0, never go negative
      selfLoad = () => 1000.0)
    assert(errs.isEmpty)
    val r = runs.head
    assert(r.attempts.forall { case (l, _) => l === 0.0 })
    assert(r.rawLoads.length === r.attempts.length)
    assert(r.rawLoads.forall(_ > 0.0)) // a live host reads some loadavg
  }
}
