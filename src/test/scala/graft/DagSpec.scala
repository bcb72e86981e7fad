package graft

import graft.pipeline.{Dag, Expectations, ManifestTable}
import graft.pipeline.Dag._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative pipeline DAG (round 19): topological ordering with
  * construction-time validation, incremental row-wise + mergeable-
  * state flows, per-run idempotency, expectations per flow, and the
  * event log.
  */
class DagSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("construction: topo order, cycles, unknown inputs, duplicate names, aggregate-expectation refusal") {
    def d(name: String, ins: Seq[String]) = TableDef(name, s"/x/$name",
      if (ins.isEmpty) Ingest((s, _) => s.range(1).toDF())
      else Materialize(ins, m => m.values.head))
    val ordered = Dag(Seq(
      d("gold", Seq("silver")), d("bronze", Nil),
      d("silver", Seq("bronze")))).ordered.map(_.name)
    assert(ordered === Seq("bronze", "silver", "gold"))
    // diamond: both mid tables precede the sink
    val dia = Dag(Seq(d("sink", Seq("l", "r")), d("l", Seq("src")),
      d("r", Seq("src")), d("src", Nil))).ordered.map(_.name)
    assert(dia.head === "src" && dia.last === "sink")
    intercept[IllegalArgumentException] {
      Dag(Seq(d("a", Seq("b")), d("b", Seq("a"))))
    }
    intercept[IllegalArgumentException] {
      Dag(Seq(d("a", Seq("nope"))))
    }
    intercept[IllegalArgumentException] {
      Dag(Seq(d("a", Nil), d("a", Nil)))
    }
    intercept[IllegalArgumentException] {
      TableDef("g", "/x/g", Aggregate("s", identity, identity,
        (a, _) => a, lit(true), Seq("k")),
        expectations = Seq(Expectations.expect("r", "true")))
    }
  }

  test("end-to-end incremental refresh: transform reads only new versions, aggregate folds deltas, replay no-ops, event log records") {
    val root = tmp("graft_dag_e2e")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val goldP = s"$root/gold"; val eventsP = s"$root/_events"
    def batch(run: Long): DataFrame =
      if (run == 1L) Seq((1L, "a", 10.0), (2L, "P", 20.0), (3L, "a", 30.0))
        .toDF("id", "status", "v")
      else Seq((4L, "a", 40.0), (5L, "P", 50.0)).toDF("id", "status", "v")
    def stateOf(df: DataFrame) = df.groupBy(col("status").as("grp"))
      .agg(sum(col("v").cast("decimal(30,6)")).as("s"),
        count(lit(1)).as("n"))
    def negate(df: DataFrame) = df.select(col("grp"),
      (-col("s")).as("s"), (-col("n")).as("n"))
    def merge(a: DataFrame, b: DataFrame) = a.unionByName(b)
      .groupBy("grp").agg(sum("s").as("s"), sum("n").as("n"))
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((_, run) => batch(run))),
      TableDef("silver", silverP, Transform("bronze", df =>
        df.withColumn("v", col("v") + 1.0)),
        expectations = Seq(
          Expectations.expectOrDrop("no_p", "status <> 'P'"))),
      TableDef("gold", goldP, Aggregate("silver", stateOf, negate,
        merge, col("n") > 0, Seq("grp")))),
      eventLog = Some(eventsP))
    val r1 = dag.refresh(spark, 1L)
    assert(r1.map(_.outcome) === Seq("landed", "landed", "merged"))
    // the DROP expectation filtered id=2 and its metrics recorded
    assert(r1(1).expectMetrics.contains("\"no_p\":{\"violated\":1,\"passed\":2}"))
    assert(ManifestTable.read(spark, silverP).count() === 2L)
    val r2 = dag.refresh(spark, 2L)
    val s2 = r2.find(_.table == "silver").get
    assert(s2.versionsProcessed === 1L,
      "run 2 must process only bronze v2")
    assert(s2.filesRead ===
      ManifestTable.versionAddedFileCount(spark, bronzeP, 2L).toLong)
    // gold state: decimal-exact fold over both runs' kept rows
    val gold = ManifestTable.read(spark, goldP)
      .select(col("grp"), col("s").cast("double"), col("n"))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gold("a") === ((11.0 + 31.0 + 41.0, 3L)))
    assert(!gold.contains("P"))
    // replay run 2: every flow no-ops, the event log gains nothing
    val before = dag.events(spark).count()
    val r2b = dag.refresh(spark, 2L)
    assert(r2b.map(_.outcome).forall(
      Set("skipped", "no_new_data", "unchanged")))
    assert(dag.events(spark).count() === before)
    assert(before === 6L, "2 runs x 3 tables")
    // event log carries the audit columns
    val cols = dag.events(spark).columns.toSet
    assert(Set("run_id", "table", "flow", "outcome", "files_read",
      "versions_processed", "expect_metrics").subsetOf(cols))
  }

  test("Cdc flow: APPLY CHANGES as a pipeline edge — target created on first refresh, sequence ordering and deletes inherited, replay no-ops") {
    val root = tmp("graft_dag_cdc")
    val feedP = s"$root/feed"; val dimP = s"$root/dim"
    def events(run: Long): DataFrame =
      if (run == 1L) Seq(
        (1L, "a1", 1L, false), (1L, "a2", 5L, false), // in-batch race
        (2L, "b", 3L, false))
        .toDF("id", "attr", "seq", "del")
      else Seq(
        (1L, "late", 2L, false),                      // pruned (< 5)
        (2L, "b", 9L, true),                          // delete
        (3L, "c", 1L, false))
        .toDF("id", "attr", "seq", "del")
    val dag = Dag(Seq(
      TableDef("feed", feedP, Ingest((_, run) => events(run))),
      TableDef("dim", dimP, Cdc("feed", "id", "seq",
        deleteWhen = Some("del")))))
    val r1 = dag.refresh(spark, 1L)
    assert(r1.map(_.outcome) === Seq("landed", "applied"))
    val s1 = ManifestTable.read(spark, dimP)
      .select("id", "attr", "_seq").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(s1 === Seq((1L, "a2", 5L), (2L, "b", 3L)))
    dag.refresh(spark, 2L)
    val s2 = ManifestTable.read(spark, dimP)
      .select("id", "attr", "_seq").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(s2 === Seq((1L, "a2", 5L), (3L, "c", 1L)),
      "late event pruned, delete applied, new key inserted")
    val r2b = dag.refresh(spark, 2L)
    assert(r2b.map(_.outcome) === Seq("skipped", "no_new_data"))
    // describe() lists the graph in refresh order
    val desc = dag.describe(spark)
      .select("table", "flow").as[(String, String)].collect().toSeq
    assert(desc === Seq(("feed", "ingest"), ("dim", "cdc")))
  }

  test("FAILURE containment: a failing flow stops downstream, logs a failed event row, and a same-run retry resumes from the failure") {
    val root = tmp("graft_dag_fail")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val goldP = s"$root/gold"; val eventsP = s"$root/_events"
    @volatile var boom = true
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP,
        Ingest((_, run) => Seq((run, 1.0)).toDF("id", "v"))),
      TableDef("silver", silverP, Transform("bronze", df =>
        if (boom) sys.error("transform exploded") else df)),
      TableDef("gold", goldP, Materialize(Seq("silver"),
        m => m("silver").groupBy().agg(sum("v").as("sv"))))),
      eventLog = Some(eventsP))
    val e = intercept[IllegalStateException] { dag.refresh(spark, 1L) }
    assert(e.getMessage.contains("failed at table 'silver'"))
    // bronze committed and logged; silver logged as failed with the
    // error in its metrics column; gold never ran
    assert(ManifestTable.read(spark, bronzeP).count() === 1L)
    val ev1 = dag.events(spark)
      .select("table", "outcome", "expect_metrics").collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.getString(2))))).toMap
    assert(ev1("bronze")._1 === "landed")
    assert(ev1("silver")._1 === "failed" &&
      ev1("silver")._2.exists(_.contains("transform exploded")))
    assert(!ev1.contains("gold"), "downstream must not run")
    assert(ManifestTable.currentVersion(spark, goldP).isEmpty)
    // same-run retry: bronze no-ops on its tag, silver and gold land
    boom = false
    val r = dag.refresh(spark, 1L)
    assert(r.map(x => (x.table, x.outcome)) === Seq(
      ("bronze", "skipped"), ("silver", "landed"), ("gold", "landed")))
    // the retry's events logged under the run tag (the failed attempt
    // left it free)
    assert(dag.events(spark).filter(col("outcome") === "landed")
      .count() >= 3L)
  }

  test("row-wise Transform refuses a non-append upstream commit loudly") {
    val root = tmp("graft_dag_na")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP,
        Ingest((_, run) => Seq((run, "x")).toDF("id", "s"))),
      TableDef("silver", silverP,
        Transform("bronze", df => df))))
    dag.refresh(spark, 1L)
    // an upstream MERGE (rewrite commit) breaks the row-wise contract
    ManifestTable.merge(
      Seq((1L, "y")).toDF("id", "s"), bronzeP, "id")
    val e = intercept[IllegalStateException] {
      dag.refresh(spark, 2L)
    }
    assert(e.getMessage.contains("failed at table 'silver'") &&
      Option(e.getCause).exists(_.getMessage.contains("NON-APPEND")))
  }
}
