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

  test("FULL refresh (selective): a rule landing after history applies retroactively, the aggregate folds the rebuild exactly, and the watermark holds") {
    val root = tmp("graft_dag_full")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val goldP = s"$root/gold"
    def batch(run: Long): DataFrame =
      if (run == 1L) Seq((1L, "a", 10.0), (2L, "P", 20.0), (3L, "a", 30.0))
        .toDF("id", "status", "v")
      else if (run == 2L) Seq((4L, "P", 40.0), (5L, "b", 50.0))
        .toDF("id", "status", "v")
      else Seq.empty[(Long, String, Double)].toDF("id", "status", "v")
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((_, run) => batch(run))),
      TableDef("silver", silverP, Transform("bronze", df => df)),
      TableDef("gold", goldP, Dag.aggregateOf("silver",
        groupBy = Seq("status"),
        aggs = Seq(("sum", "v", "sv"), ("count", "*", "n"))))))
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    assert(ManifestTable.read(spark, silverP).count() === 5L)
    // the quality bar moves AFTER history landed
    ManifestTable.addExpectation(spark, silverP, "no_p",
      "status <> 'P'", onViolation = "drop")
    val r3 = dag.refreshFull(spark, 3L, tables = Set("silver"))
    assert(r3.find(_.table == "silver").get.outcome === "recomputed")
    assert(r3.find(_.table == "gold").get.outcome === "merged",
      "gold must fold the rebuild incrementally")
    assert(ManifestTable.read(spark, silverP).count() === 3L,
      "the DROP rule must apply retroactively through the rebuild")
    val gold = ManifestTable.read(spark, goldP)
      .select(col("status"), col("sv").cast("double"), col("n"))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gold === Map("a" -> ((40.0, 2L)), "b" -> ((50.0, 1L))),
      "the 'P' group must fully retract, others reduce exactly")
    // watermark holds: the next incremental pass processes ONLY the
    // versions the rebuild did not cover
    val r4 = dag.refresh(spark, 4L)
    val s4 = r4.find(_.table == "silver").get
    assert(s4.versionsProcessed === 1L,
      s"rebuild watermark must hold (processed ${s4.versionsProcessed})")
  }

  test("FULL refresh: default set rebuilds every derived table; naming a source edge refuses") {
    val root = tmp("graft_dag_fulldef")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val goldP = s"$root/gold"
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((_, run) =>
        if (run == 1L) Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
        else Seq.empty[(Long, Double)].toDF("id", "v"))),
      TableDef("silver", silverP, Transform("bronze", df => df)),
      TableDef("gold", goldP, Materialize(Seq("silver"),
        m => m("silver").groupBy().agg(sum("v").as("sv"))))))
    dag.refresh(spark, 1L)
    assert(dag.derivedTables === Set("silver", "gold"))
    val r = dag.refreshFull(spark, 2L)
    assert(r.map(x => (x.table, x.outcome)) === Seq(
      ("bronze", "landed"), ("silver", "recomputed"),
      ("gold", "recomputed")))
    // a full refresh is imperative: replaying it rebuilds again
    val r2 = dag.refreshFull(spark, 2L)
    assert(r2.find(_.table == "gold").get.outcome === "recomputed")
    intercept[IllegalArgumentException] {
      dag.refreshFull(spark, 3L, tables = Set("bronze"))
    }
    intercept[IllegalArgumentException] {
      dag.refreshFull(spark, 3L, tables = Set("nope"))
    }
  }

  test("FULL refresh of a Cdc edge: SCD1 rebuild equals the incremental dimension; SCD2 collapses to the rebuilt open slice") {
    val root = tmp("graft_dag_fullcdc")
    val feedP = s"$root/feed"; val dimP = s"$root/dim"
    val dim2P = s"$root/dim2"
    def events(run: Long): DataFrame =
      if (run == 1L) Seq(
        (1L, "a1", 1L, false), (1L, "a2", 5L, false),
        (2L, "b", 3L, false)).toDF("id", "attr", "seq", "del")
      else if (run == 2L) Seq(
        (1L, "late", 2L, false), (2L, "b", 9L, true),
        (3L, "c", 1L, false)).toDF("id", "attr", "seq", "del")
      else Seq.empty[(Long, String, Long, Boolean)]
        .toDF("id", "attr", "seq", "del")
    val dag = Dag(Seq(
      TableDef("feed", feedP, Ingest((_, run) => events(run))),
      TableDef("dim", dimP, Cdc("feed", "id", "seq",
        deleteWhen = Some("del"))),
      TableDef("dim2", dim2P, Cdc("feed", "id", "seq",
        deleteWhen = Some("del"), scd2Tracked = Some(Seq("attr"))))))
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    val incr = ManifestTable.read(spark, dimP)
      .select("id", "attr", "_seq").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    val openIncr = ManifestTable.read(spark, dim2P)
      .filter(col(graft.pipeline.Scd2.ValidTo).isNull)
      .select("id", "attr", "_seq").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(ManifestTable.read(spark, dim2P).count() > openIncr.size.toLong,
      "incremental SCD2 must have accumulated closed history")
    val r = dag.refreshFull(spark, 3L)
    assert(r.filter(x => Set("dim", "dim2")(x.table))
      .forall(_.outcome == "recomputed"))
    val rebuilt = ManifestTable.read(spark, dimP)
      .select("id", "attr", "_seq").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(rebuilt === incr,
      "SCD1 rebuild must equal the incrementally-built dimension")
    // SCD2: history collapses by construction — every surviving key
    // open at the rebuild's logical time with its final image
    val d2 = ManifestTable.read(spark, dim2P)
    assert(d2.filter(col(graft.pipeline.Scd2.ValidTo).isNotNull)
      .count() === 0L, "rebuild holds no closed rows")
    val open2 = d2.select("id", "attr", "_seq")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(open2 === openIncr,
      "the rebuilt open slice must equal the incremental open slice")
    // watermark holds on both: a plain refresh no-ops
    val r4 = dag.refresh(spark, 3L)
    assert(r4.filter(x => Set("dim", "dim2")(x.table))
      .forall(x => x.outcome == "no_new_data"))
  }

  test("QUARANTINE: DROP-rule rejects land in the side table with rule names and run id, exactly-once; construction refusals") {
    val root = tmp("graft_dag_quar")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val quarP = s"$root/quar"
    def batch(run: Long): DataFrame =
      if (run == 1L) Seq((1L, "a", 10.0), (2L, "P", -5.0), (3L, "P", 30.0))
        .toDF("id", "status", "v")
      else Seq((4L, "a", -1.0), (5L, "b", 50.0)).toDF("id", "status", "v")
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((_, run) => batch(run))),
      TableDef("silver", silverP, Transform("bronze", df => df),
        expectations = Seq(
          Expectations.expectOrDrop("no_p", "status <> 'P'"),
          Expectations.expectOrDrop("pos_v", "v > 0"),
          Expectations.expect("small", "v < 100")),
        quarantineAt = Some(quarP))))
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    assert(ManifestTable.read(spark, silverP)
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 5L))
    val q = ManifestTable.read(spark, quarP)
      .select("id", "_violated", "_run_id")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(q === Seq(
      (2L, "no_p,pos_v", 1L), (3L, "no_p", 1L), (4L, "pos_v", 2L)),
      s"quarantine must carry every violated DROP rule, got $q")
    // crash window between quarantine and main commit: the quarantine
    // append already landed under its derived tag — a replay must
    // no-op it while the main commit proceeds. Simulate by
    // pre-landing run-3's quarantine rows under the derived tag.
    def b3 = Seq((6L, "P", 6.0)).toDF("id", "status", "v")
    val dag3 = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((_, _) => b3)),
      TableDef("silver", silverP, Transform("bronze", df => df),
        expectations = Seq(
          Expectations.expectOrDrop("no_p", "status <> 'P'")),
        quarantineAt = Some(quarP))))
    // bronze lands v3 through run 3, then silver crashes mid-pair:
    // quarantine committed, main not
    val bronzeV = ManifestTable.append(b3, bronzeP,
      tag = Some("dag-bronze-run3"))
    ManifestTable.appendIdempotent(
      Expectations.quarantined(b3,
        Seq(Expectations.expectOrDrop("no_p", "status <> 'P'")))
        .withColumn("_run_id", lit(3L)),
      quarP, tag = s"dag-silver-v$bronzeV-q")
    val qBefore = ManifestTable.read(spark, quarP).count()
    val r3 = dag3.refresh(spark, 3L)
    assert(r3.map(_.outcome) === Seq("skipped", "landed"))
    assert(ManifestTable.read(spark, quarP).count() === qBefore,
      "the retry must not re-quarantine (tag no-ops)")
    assert(ManifestTable.read(spark, silverP).count() === 2L,
      "the retry's main commit must land (id 6 drops)")
    // a violation-free batch commits NOTHING to the quarantine table —
    // without the emptiness skip every clean refresh would grow it by
    // one empty version forever
    val qVer = ManifestTable.currentVersion(spark, quarP).get
    val dag4 = Dag(Seq(
      TableDef("bronze", bronzeP,
        Ingest((_, _) => Seq((7L, "clean", 7.0)).toDF("id", "status", "v"))),
      TableDef("silver", silverP, Transform("bronze", df => df),
        expectations = Seq(
          Expectations.expectOrDrop("no_p", "status <> 'P'")),
        quarantineAt = Some(quarP))))
    dag4.refresh(spark, 4L)
    assert(ManifestTable.currentVersion(spark, quarP).get === qVer,
      "a clean batch must not add a quarantine version")
    assert(ManifestTable.read(spark, silverP).count() === 3L)
    // construction refusals: recompute flows and drop-less rule sets
    intercept[IllegalArgumentException] {
      TableDef("m", "/x/m", Materialize(Seq("s"), m => m.values.head),
        expectations = Seq(Expectations.expectOrDrop("r", "true")),
        quarantineAt = Some("/x/q"))
    }
    intercept[IllegalArgumentException] {
      TableDef("t", "/x/t", Transform("s", df => df),
        expectations = Seq(Expectations.expect("warn_only", "true")),
        quarantineAt = Some("/x/q"))
    }
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

  test("SnapshotCdc flow: external upstream replaced between refreshes — deletes/updates/inserts apply, unchanged keys untouched, replay no-ops, SCD2 tracks history") {
    val root = tmp("graft_dag_snap")
    val srcP = s"$root/src"; val dimP = s"$root/dim"
    val dim2P = s"$root/dim2"
    val dag = Dag(Seq(
      TableDef("src", srcP, External()),
      TableDef("dim", dimP, SnapshotCdc("src", "id")),
      TableDef("dim2", dim2P,
        SnapshotCdc("src", "id", scd2Tracked = Some(Seq("v"))))))
    // snapshot 1: keys 1-3
    ManifestTable.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "s", "v"), srcP)
    val r1 = dag.refresh(spark, 1L)
    assert(r1.map(_.outcome) === Seq("source", "applied", "applied"))
    // snapshot 2 REPLACES the source: 1 deleted, 2 unchanged,
    // 3 updated, 4 inserted
    ManifestTable.write(
      Seq((2L, "b", 20.0), (3L, "c", 33.0), (4L, "d", 40.0))
        .toDF("id", "s", "v"), srcP)
    val r2 = dag.refresh(spark, 2L)
    assert(r2.find(_.table == "dim").get.outcome === "applied")
    val dim = ManifestTable.read(spark, dimP)
      .select("id", "s", "v", "_seq").as[(Long, String, Double, Long)]
      .collect().sortBy(_._1)
    assert(dim.toSeq === Seq((2L, "b", 20.0, 1L), (3L, "c", 33.0, 2L),
      (4L, "d", 40.0, 2L)),
      "unchanged key 2 keeps _seq 1 — the merge touched only changes")
    // SCD2 sibling: key 3's tracked change closed the old row
    val h = ManifestTable.read(spark, dim2P)
      .select("id", "v", graft.pipeline.Scd2.ValidTo)
      .as[(Long, Double, Option[Long])].collect().sortBy(r => (r._1, r._2))
    assert(h.count(_._1 == 3L) === 2)
    assert(h.filter(_._1 == 3L).map(r => (r._2, r._3.isEmpty)).toSeq
      === Seq((30.0, false), (33.0, true)))
    assert(h.filter(_._1 == 1L).forall(_._3.nonEmpty),
      "deleted key 1 has only closed rows")
    // replay: the version watermark no-ops both dimensions
    val r3 = dag.refresh(spark, 3L)
    assert(r3.filter(_.flowKind == "snapshot_cdc")
      .forall(_.outcome == "no_new_data"))
    // FULL refresh: the dimension rebuilds from the current snapshot;
    // the EXTERNAL source itself refuses
    val rf = dag.refreshFull(spark, 4L, tables = Set("dim"))
    assert(rf.find(_.table == "dim").get.outcome === "recomputed")
    val rebuilt = ManifestTable.read(spark, dimP)
      .select("id", "v").as[(Long, Double)].collect().sortBy(_._1)
    assert(rebuilt.toSeq === Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)))
    intercept[IllegalArgumentException] {
      dag.refreshFull(spark, 5L, tables = Set("src"))
    }
    intercept[IllegalArgumentException] {
      TableDef("x", "/x/x", External(),
        expectations = Seq(Expectations.expect("r", "true")))
    }
    assert(!dag.derivedTables.contains("src"))
  }

  test("CONTINUOUS mode: feed-triggered cascade shares the triggered watermarks, resumes from checkpoints, refuses non-watermark edges") {
    val root = tmp("graft_dag_cont")
    val srcP = s"$root/src"; val silverP = s"$root/silver"
    val goldP = s"$root/gold"; val ckpt = s"$root/_ckpt"
    val dag = Dag(Seq(
      TableDef("src", srcP, External()),
      TableDef("silver", silverP,
        Transform("src", df => df.filter(col("grp") =!= "drop"))),
      TableDef("gold", goldP, Dag.aggregateOf("silver", Seq("grp"),
        Seq(("sum", "v", "sv"), ("count", "*", "n"))))))
    def gold(): Map[String, (Double, Long)] =
      ManifestTable.read(spark, goldP)
        .select(col("grp"), col("sv").cast("double"), col("n"))
        .as[(String, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // batch 1 lands BEFORE start — the bootstrap pass catches it
    ManifestTable.write(
      Seq(("a", 10.0), ("b", 20.0), ("drop", 99.0)).toDF("grp", "v"),
      srcP)
    val qs = dag.continuous(spark, ckpt)
    try {
      assert(qs.map(_.name) === Seq("dag-silver", "dag-gold"))
      assert(ManifestTable.currentVersion(spark, silverP)
        .contains(1L), "bootstrap must create and fill silver")
      assert(gold() === Map("a" -> ((10.0, 1L)), "b" -> ((20.0, 1L))))
      // batch 2 lands WHILE RUNNING — src's commit cascades through
      ManifestTable.append(Seq(("a", 5.0)).toDF("grp", "v"), srcP)
      qs.foreach(_.processAllAvailable())
      assert(ManifestTable.currentVersion(spark, silverP)
        .contains(2L), "the live stream must apply batch 2")
      assert(gold() === Map("a" -> ((15.0, 2L)), "b" -> ((20.0, 1L))))
    } finally qs.foreach(_.stop())
    // the modes COMPOSE on shared watermarks: a triggered refresh on
    // the caught-up graph no-ops every derived edge
    assert(dag.refresh(spark, 99L)
      .filter(d => Set("transform", "aggregate")(d.flowKind))
      .forall(r => Set("no_new_data", "unchanged")(r.outcome)))
    // batch 3 lands while STOPPED — the restart resumes and catches up
    ManifestTable.append(Seq(("b", 7.0)).toDF("grp", "v"), srcP)
    val qs2 = dag.continuous(spark, ckpt)
    try {
      qs2.foreach(_.processAllAvailable())
      assert(gold() === Map("a" -> ((15.0, 2L)), "b" -> ((27.0, 2L))))
      // idle drain: nothing new must commit nothing
      val v = ManifestTable.currentVersion(spark, goldP).get
      qs2.foreach(_.processAllAvailable())
      assert(ManifestTable.currentVersion(spark, goldP).get === v)
    } finally qs2.foreach(_.stop())
    // non-watermark edges refuse loudly
    val mDag = Dag(Seq(
      TableDef("src", srcP, External()),
      TableDef("m", s"$root/m",
        Materialize(Seq("src"), fs => fs.values.head))))
    val e = intercept[IllegalArgumentException] {
      mDag.continuous(spark, s"$root/_ckpt2")
    }
    assert(e.getMessage.contains("cannot run continuously"))
  }

  test("CONTINUOUS Cdc edge: a live CDC feed maintains the dimension through the stream, sequence semantics intact") {
    val root = tmp("graft_dag_contcdc")
    val feedP = s"$root/feed"; val dimP = s"$root/dim"
    val dag = Dag(Seq(
      TableDef("feed", feedP, External()),
      TableDef("dim", dimP,
        Cdc("feed", "id", "seq", deleteWhen = Some("del")))))
    // bootstrap batch: key 1 inserted, key 2 insert+delete race
    ManifestTable.write(
      Seq((1L, "a", 1L, false), (2L, "x", 1L, false),
        (2L, "x", 2L, true)).toDF("id", "attr", "seq", "del"), feedP)
    val qs = dag.continuous(spark, ckptRootOf(root))
    try {
      // live events: late update for 1 (ignored), newer update for 1,
      // fresh key 3
      ManifestTable.append(
        Seq((1L, "stale", 0L, false), (1L, "b", 5L, false),
          (3L, "c", 1L, false)).toDF("id", "attr", "seq", "del"),
        feedP)
      qs.foreach(_.processAllAvailable())
      val dim = ManifestTable.read(spark, dimP)
        .select("id", "attr", "_seq").as[(Long, String, Long)]
        .collect().sortBy(_._1)
      assert(dim.toSeq === Seq((1L, "b", 5L), (3L, "c", 1L)),
        "delete wins the race, late event ignored, newest survives")
    } finally qs.foreach(_.stop())
  }

  private def ckptRootOf(root: String): String = s"$root/_ckpt"

  test("describeExtended joins each table's last event-log record; NULLs before any refresh and past vacuumed retention") {
    val root = tmp("graft_dag_dx")
    val bronzeP = s"$root/bronze"; val silverP = s"$root/silver"
    val eventsP = s"$root/_events"
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP,
        Ingest((_, run) => Seq((run, "x")).toDF("id", "s"))),
      TableDef("silver", silverP, Transform("bronze", df => df))),
      eventLog = Some(eventsP))
    dag.ensureEventLog(spark)
    // no refresh yet: graph rows with NULL event columns
    val d0 = dag.describeExtended(spark).collect()
    assert(d0.length === 2 && d0.forall(_.isNullAt(5)))
    assert(dag.maxLoggedRun(spark) === 0L)
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    val d2 = dag.describeExtended(spark).collect()
      .map(r => r.getString(0) -> ((r.getLong(5), r.getString(6)))).toMap
    assert(d2("bronze") === ((2L, "landed")))
    assert(d2("silver") === ((2L, "landed")))
    assert(dag.maxLoggedRun(spark) === 2L)
  }
}
