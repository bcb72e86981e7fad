package graft

import graft.pipeline.{ManifestTable, Pipelines}
import org.apache.spark.sql.functions._

/** SQL spelling of the declarative pipeline (round 19): CREATE
  * PIPELINE parses the whole graph in one statement, REFRESH runs it
  * topologically (COPY ledger ingest, incremental SELECT over new
  * rows, materialized SELECT, APPLY CHANGES edge), DESCRIBE/DROP
  * manage the registry.
  */
class PipelineSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("CREATE/REFRESH/DESCRIBE/DROP PIPELINE end to end: copy ingest, incremental with EXPECT, materialized gold") {
    val root = tmp("graft_psql")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // source files, batch 1 (raw parquet dir — a landing zone)
    Seq((1L, "a", 10.0), (2L, "P", 20.0), (3L, "a", 30.0))
      .toDF("id", "status", "v")
      .coalesce(1).write.mode("append").parquet(src)
    GraftSession.withSqlExtensions(spark) { s =>
      val created = s.sql(
        s"""CREATE PIPELINE psql EVENT LOG AT '$root/_events' AS
            TABLE bronze AT '$root/bronze' AS COPY FROM '$src'
              PATTERN '*.parquet' ;
            TABLE silver AT '$root/silver'
              EXPECT no_p (status <> 'P') ON VIOLATION DROP ROW
              EXPECT pos_v (v > 0)
              INCREMENTAL FROM bronze AS
                SELECT id, status, v + 1.0 AS v FROM bronze ;
            TABLE gold AT '$root/gold' MATERIALIZED FROM silver AS
              SELECT status, CAST(SUM(CAST(v AS DECIMAL(30,6)))
                AS DOUBLE) AS sv, COUNT(*) AS n
              FROM silver GROUP BY status""").collect()
      assert(created.head.getString(0) === "psql" &&
        created.head.getLong(1) === 3L)
      // DESCRIBE lists the graph in refresh order with expectations
      val desc = s.sql("DESCRIBE PIPELINE psql").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(4)))
      assert(desc === Array(
        ("bronze", "copy", ""),
        ("silver", "transform", "no_p:drop,pos_v:warn"),
        ("gold", "materialize", "")))
      // run 1
      val r1 = s.sql("REFRESH PIPELINE psql RUN 1").collect()
      assert(r1.map(r => (r.getString(0), r.getString(2))).toSeq ===
        Seq(("bronze", "ingested"), ("silver", "landed"),
          ("gold", "landed")))
      assert(ManifestTable.read(s, s"$root/silver")
        .select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq === Seq(1L, 3L),
        "the DROP expectation must filter the 'P' row")
      // batch 2 lands in the SOURCE DIR; refresh ingests ONLY the new
      // file (copy ledger) and silver processes ONLY bronze v2
      Seq((4L, "a", 40.0), (5L, "P", 50.0)).toDF("id", "status", "v")
        .coalesce(1).write.mode("append").parquet(src)
      val r2 = s.sql("REFRESH PIPELINE psql RUN 2").collect()
      val bronze2 = r2.find(_.getString(0) == "bronze").get
      assert(bronze2.getString(2) === "ingested" &&
        bronze2.getLong(5) === 1L, "exactly ONE new file ingested")
      val silver2 = r2.find(_.getString(0) == "silver").get
      assert(silver2.getLong(4) === 1L,
        "silver must process exactly one new bronze version")
      // gold is a full recompute over silver = kept rows of both runs
      val gold = ManifestTable.read(s, s"$root/gold")
        .select("status", "sv", "n").collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
        .toMap
      assert(gold("a") === ((11.0 + 31.0 + 41.0, 3L)))
      assert(!gold.contains("P"))
      // replayed run: copy no-ops on the ledger, silver on the
      // watermark, gold on the run tag
      val r2b = s.sql("REFRESH PIPELINE psql RUN 2").collect()
      assert(r2b.map(_.getString(2)).toSeq ===
        Seq("no_new_files", "no_new_data", "skipped"))
      // event log recorded 3 runs x 3 tables minus the replay's
      // idempotent append (runs 1 and 2 only)
      assert(ManifestTable.read(s, s"$root/_events").count() === 6L)
      // unknown pipeline and DROP
      val e = intercept[Exception] {
        s.sql("REFRESH PIPELINE nope").collect()
      }
      assert(e.getMessage.contains("no pipeline"))
      assert(s.sql("DROP PIPELINE psql").collect().head.getBoolean(0))
      assert(!Pipelines.names.contains("psql"))
    }
  }

  test("AGGREGATE flow compiles SQL SUM/COUNT to the exact mergeable-state fold — incremental, retraction-aware, no tombstones") {
    val root = tmp("graft_psql_agg")
    // the upstream is a MANAGED table written outside the pipeline —
    // the aggregate edge folds its change feed directly
    val up = s"$root/facts"
    ManifestTable.write(
      Seq(("a", 1.5), ("a", 2.25), ("b", 10.0)).toDF("grp", "v"), up)
    GraftSession.withSqlExtensions(spark) { s =>
      s.sql(s"""CREATE PIPELINE pagg AS
                TABLE facts AT '$up' AS COPY FROM '$root/nowhere_empty' ;
                TABLE gold AT '$root/gold' AGGREGATE FROM facts
                  GROUP BY (grp)
                  AGG (SUM(v * 2) AS dv, COUNT(*) AS n)""").collect()
      // note: the copy edge points at an empty dir on purpose — the
      // upstream data was loaded directly; the edge just no-ops
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/nowhere_empty"))
      def gold() = ManifestTable.read(s, s"$root/gold")
        .select("grp", "dv", "n").collect()
        .map(r => r.getString(0) ->
          ((r.getDecimal(1).doubleValue(), r.getLong(2)))).toMap
      s.sql("REFRESH PIPELINE pagg RUN 1").collect()
      assert(gold() === Map("a" -> ((7.5, 2L)), "b" -> ((20.0, 1L))))
      // retraction: a DELETE of one 'a' fact must negate exactly; a
      // full delete of 'b' must drop the group (no tombstone)
      ManifestTable.deleteWhere(s, up,
        col("v") === 2.25 || col("grp") === "b")
      s.sql("REFRESH PIPELINE pagg RUN 2").collect()
      assert(gold() === Map("a" -> ((3.0, 1L))),
        "negation must be exact and the emptied group must vanish")
      // replay no-ops
      val r = s.sql("REFRESH PIPELINE pagg RUN 2").collect()
        .map(_.getString(2)).toSeq
      assert(r(1) === "no_new_data")
      s.sql("DROP PIPELINE pagg").collect()
      // EXPECT on an aggregate edge refuses at CREATE
      val e = intercept[Exception] {
        s.sql(s"""CREATE PIPELINE bad2 AS
                  TABLE facts AT '$up' AS COPY FROM '$root/nowhere_empty' ;
                  TABLE g AT '$root/g' EXPECT r (n > 0)
                    AGGREGATE FROM facts GROUP BY (grp)
                    AGG (COUNT(*) AS n)""").collect()
      }
      assert(e.getMessage.contains("Aggregate flow"))
      // unsupported aggregate function refuses at CREATE
      val e2 = intercept[Exception] {
        s.sql(s"""CREATE PIPELINE bad3 AS
                  TABLE facts AT '$up' AS COPY FROM '$root/nowhere_empty' ;
                  TABLE g AT '$root/g' AGGREGATE FROM facts
                    GROUP BY (grp) AGG (MAX(v) AS m)""").collect()
      }
      assert(e2.getMessage.contains("SUM(expr)|COUNT"))
    }
  }

  test("REFRESH PIPELINE ... FULL: selective rebuild through SQL — the rule lands after history, the rebuild drops it retroactively") {
    val root = tmp("graft_psql_full")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, "a", 10.0), (2L, "P", 20.0), (3L, "b", 30.0))
      .toDF("id", "status", "v")
      .coalesce(1).write.mode("append").parquet(src)
    GraftSession.withSqlExtensions(spark) { s =>
      s.sql(
        s"""CREATE PIPELINE psqlf AS
            TABLE bronze AT '$root/bronze' AS COPY FROM '$src'
              PATTERN '*.parquet' ;
            TABLE silver AT '$root/silver' INCREMENTAL FROM bronze AS
              SELECT id, status, v FROM bronze ;
            TABLE gold AT '$root/gold' AGGREGATE FROM silver
              GROUP BY (status) AGG (SUM(v) AS sv, COUNT(*) AS n)"""
      ).collect()
      s.sql("REFRESH PIPELINE psqlf RUN 1").collect()
      // the quality bar moves AFTER history landed
      s.sql(s"""ALTER TABLE '$root/silver' ADD EXPECTATION no_p
        EXPECT (status <> 'P') ON VIOLATION DROP ROW""").collect()
      val r = s.sql("REFRESH PIPELINE psqlf FULL TABLES (silver) RUN 2")
        .collect().map(x => x.getString(0) -> x.getString(2)).toMap
      assert(r("silver") === "recomputed" && r("gold") === "merged")
      assert(ManifestTable.read(s, s"$root/silver").count() === 2L,
        "the persisted DROP rule must apply retroactively")
      val gold = ManifestTable.read(s, s"$root/gold")
        .select(col("status"), col("sv").cast("double"), col("n"))
        .as[(String, Double, Long)].collect()
        .map(x => x._1 -> ((x._2, x._3))).toMap
      assert(gold === Map("a" -> ((10.0, 1L)), "b" -> ((30.0, 1L))),
        "the 'P' group must fully retract through the incremental fold")
      // bare FULL rebuilds every derived table
      val r2 = s.sql("REFRESH PIPELINE psqlf FULL RUN 3").collect()
        .map(x => x.getString(0) -> x.getString(2)).toMap
      assert(r2("silver") === "recomputed" && r2("gold") === "recomputed")
      // incremental refresh resumes PAST the rebuild: a new source
      // file folds in on top of the rebuilt state, one version only
      Seq((6L, "a", 5.0), (7L, "P", 7.0)).toDF("id", "status", "v")
        .coalesce(1).write.mode("append").parquet(src)
      val r3 = s.sql("REFRESH PIPELINE psqlf RUN 5").collect()
        .map(x => (x.getString(0), x.getString(2), x.getLong(4)))
      assert(r3.find(_._1 == "silver").get._3 === 1L,
        "silver must process only the post-rebuild bronze version")
      assert(r3.find(_._1 == "gold").get._2 === "merged")
      val gold2 = ManifestTable.read(s, s"$root/gold")
        .select(col("status"), col("sv").cast("double"), col("n"))
        .as[(String, Double, Long)].collect()
        .map(x => x._1 -> ((x._2, x._3))).toMap
      assert(gold2 === Map("a" -> ((15.0, 2L)), "b" -> ((30.0, 1L))),
        "the fold must resume exactly past the rebuild (no double-" +
          "count, the persisted rule still gating the new batch)")
      // naming a source edge refuses
      val e = intercept[IllegalArgumentException] {
        s.sql("REFRESH PIPELINE psqlf FULL TABLES (bronze) RUN 4")
          .collect()
      }
      assert(e.getMessage.contains("source edge"))
      s.sql("DROP PIPELINE psqlf").collect()
    }
  }

  test("QUARANTINE AT in SQL: the DROP rule's rejects land beside the table") {
    val root = tmp("graft_psql_quar")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, "a", 10.0), (2L, "P", 20.0), (3L, "b", 30.0))
      .toDF("id", "status", "v")
      .coalesce(1).write.mode("append").parquet(src)
    GraftSession.withSqlExtensions(spark) { s =>
      s.sql(
        s"""CREATE PIPELINE psqlq AS
            TABLE bronze AT '$root/bronze' AS COPY FROM '$src'
              PATTERN '*.parquet' ;
            TABLE silver AT '$root/silver'
              EXPECT no_p (status <> 'P') ON VIOLATION DROP ROW
              QUARANTINE AT '$root/quar'
              INCREMENTAL FROM bronze AS
                SELECT id, status, v FROM bronze""").collect()
      s.sql("REFRESH PIPELINE psqlq RUN 1").collect()
      assert(ManifestTable.read(s, s"$root/silver")
        .select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq === Seq(1L, 3L))
      val q = ManifestTable.read(s, s"$root/quar")
        .select("id", "_violated").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(q === Seq((2L, "no_p")))
      s.sql("DROP PIPELINE psqlq").collect()
    }
  }

  test("CREATE PIPELINE parses the APPLY CHANGES edge and refuses malformed flows at CREATE time") {
    val root = tmp("graft_psql2")
    GraftSession.withSqlExtensions(spark) { s =>
      // CDC edge parse + run: feed ingested from files, dim applied
      val src = s"$root/cdc_src"
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(src))
      Seq((1L, "x", 1L, false), (1L, "y", 5L, false),
        (2L, "z", 2L, true))
        .toDF("id", "attr", "seq", "del")
        .coalesce(1).write.mode("append").parquet(src)
      s.sql(
        s"""CREATE PIPELINE pcdc AS
            TABLE feed AT '$root/feed' AS COPY FROM '$src' ;
            TABLE dim AT '$root/dim' APPLY CHANGES FROM feed
              KEYS (id) SEQUENCE BY seq
              APPLY AS DELETE WHEN del""").collect()
      val r1 = s.sql("REFRESH PIPELINE pcdc RUN 1").collect()
      assert(r1.map(_.getString(2)).toSeq ===
        Seq("ingested", "applied"))
      val dim = ManifestTable.read(s, s"$root/dim")
        .select("id", "attr", "_seq")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2))).sorted.toSeq
      assert(dim === Seq((1L, "y", 5L)),
        "in-batch race resolves, absent-key delete no-ops")
      s.sql("DROP PIPELINE pcdc").collect()
      // a def with no recognizable flow refuses at CREATE (parse) time
      val e = intercept[Exception] {
        s.sql(s"""CREATE PIPELINE bad AS
                  TABLE t AT '$root/t' FULL JOIN nonsense""").collect()
      }
      assert(e.getMessage.contains("no recognizable flow"))
      // a cycle refuses at CREATE time (Dag construction)
      val e2 = intercept[Exception] {
        s.sql(s"""CREATE PIPELINE cyc AS
                  TABLE a AT '$root/a' INCREMENTAL FROM b AS SELECT * FROM b ;
                  TABLE b AT '$root/b' INCREMENTAL FROM a AS SELECT * FROM a""")
          .collect()
      }
      assert(e2.getMessage.contains("cycle"))
    }
  }

  test("RESTORE PIPELINE: the definition persists on the event log, a dropped registration restores, and the auto run counter resumes past logged runs") {
    val root = tmp("graft_psql_restore")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, 10.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    GraftSession.withSqlExtensions(spark) { s =>
      s.sql(
        s"""CREATE PIPELINE prest EVENT LOG AT '$root/_events' AS
            TABLE bronze AT '$root/bronze' AS COPY FROM '$src' ;
            TABLE gold AT '$root/gold' MATERIALIZED FROM bronze AS
              SELECT CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE)
                AS sv FROM bronze""").collect()
      // the definition landed as verb-managed properties on the
      // (created-empty) event-log table
      val persisted =
        ManifestTable.pipelineDefinition(s, s"$root/_events")
      assert(persisted.exists(_._1 == "prest") &&
        persisted.exists(_._2.contains("CREATE PIPELINE prest")))
      // auto run (no RUN clause) = run 1
      s.sql("REFRESH PIPELINE prest").collect()
      assert(ManifestTable.read(s, s"$root/gold")
        .head().getDouble(0) === 10.0)
      // a fresh session: registration gone, definition on disk
      Pipelines.drop("prest")
      val e = intercept[Exception] {
        s.sql("REFRESH PIPELINE prest").collect()
      }
      assert(e.getMessage.contains("no pipeline"))
      val restored =
        s.sql(s"RESTORE PIPELINE FROM '$root/_events'").collect()
      assert(restored.head.getString(0) === "prest" &&
        restored.head.getLong(1) === 2L)
      // new data lands; the restored AUTO counter must continue at
      // run 2 — a counter restarted at 1 would hit run 1's
      // materialize tag and SKIP the recompute, serving stale gold
      Seq((2L, 32.0)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(src)
      val r2 = s.sql("REFRESH PIPELINE prest").collect()
      assert(r2.find(_.getString(0) == "gold").get.getString(2)
        === "landed",
        "the restored run counter must resume past logged runs")
      assert(ManifestTable.read(s, s"$root/gold")
        .head().getDouble(0) === 42.0)
      // restoring from a table with no definition refuses loudly
      val e2 = intercept[Exception] {
        s.sql(s"RESTORE PIPELINE FROM '$root/gold'").collect()
      }
      assert(e2.getMessage.contains("no pipeline definition"))
      s.sql("DROP PIPELINE prest").collect()
    }
  }

  test("DESCRIBE PIPELINE EXTENDED joins last outcomes; VACUUM PIPELINE EVENTS trims runs past retention") {
    val root = tmp("graft_psql_dx")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, 1.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    GraftSession.withSqlExtensions(spark) { s =>
      s.sql(
        s"""CREATE PIPELINE pdx EVENT LOG AT '$root/_events' AS
            TABLE bronze AT '$root/bronze' AS COPY FROM '$src' ;
            TABLE silver AT '$root/silver' INCREMENTAL FROM bronze AS
              SELECT id, v FROM bronze""").collect()
      // before any refresh: graph rows with NULL event columns
      val d0 = s.sql("DESCRIBE PIPELINE EXTENDED pdx").collect()
      assert(d0.length === 2 && d0.forall(_.isNullAt(5)))
      s.sql("REFRESH PIPELINE pdx RUN 1").collect()
      s.sql("REFRESH PIPELINE pdx RUN 2").collect()
      s.sql("REFRESH PIPELINE pdx RUN 3").collect()
      val dx = s.sql("DESCRIBE PIPELINE EXTENDED pdx").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(5), r.getString(6)))).toMap
      assert(dx("bronze") === ((3L, "no_new_files")))
      assert(dx("silver") === ((3L, "no_new_data")))
      assert(ManifestTable.read(s, s"$root/_events")
        .select("run_id").distinct().count() === 3L)
      // retention: keep the last 2 runs
      val vac = s.sql(
        "VACUUM PIPELINE pdx EVENTS KEEP 2 RUNS").collect()
      assert(vac.head.getLong(1) === 2L)
      val runs = ManifestTable.read(s, s"$root/_events")
        .select("run_id").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(runs === Seq(2L, 3L))
      s.sql("DROP PIPELINE pdx").collect()
    }
  }

  test("START/STOP PIPELINE: continuous mode through SQL — live propagation, double-start refusal, stop idempotent") {
    val root = tmp("graft_psql_cont")
    GraftSession.withSqlExtensions(spark) { s =>
      ManifestTable.write(
        Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), s"$root/src")
      s.sql(
        s"""CREATE PIPELINE pcont AS
            TABLE src AT '$root/src' EXTERNAL ;
            TABLE silver AT '$root/silver' INCREMENTAL FROM src AS
              SELECT id, v * 2 AS v2 FROM src""").collect()
      val started =
        s.sql(s"START PIPELINE pcont CHECKPOINT AT '$root/_ckpt'")
          .collect().map(_.getString(0)).toSeq
      assert(started === Seq("dag-silver"))
      try {
        // double start refuses while running
        val e = intercept[Exception] {
          s.sql(s"START PIPELINE pcont CHECKPOINT AT '$root/_ckpt'")
            .collect()
        }
        assert(e.getMessage.contains("already running"))
        // SHOW PIPELINES reports the live query count
        val shown = s.sql("SHOW PIPELINES").collect()
          .find(_.getString(0) == "pcont").get
        assert(shown.getLong(3) === 1L)
        // a source commit propagates through the live stream
        ManifestTable.append(Seq((3L, 30.0)).toDF("id", "v"),
          s"$root/src")
        Pipelines.runningQueries("pcont").foreach(_.processAllAvailable())
        assert(ManifestTable.read(s, s"$root/silver")
          .select("v2").as[Double](org.apache.spark.sql.Encoders
            .scalaDouble).collect().sorted.toSeq
          === Seq(20.0, 40.0, 60.0))
      } finally {
        val stopped = s.sql("STOP PIPELINE pcont").collect()
          .map(_.getString(0)).toSeq
        assert(stopped === Seq("dag-silver"))
      }
      assert(s.sql("STOP PIPELINE pcont").collect().isEmpty,
        "stop is idempotent")
      assert(s.sql("SHOW PIPELINES").collect()
        .find(_.getString(0) == "pcont").get.getLong(3) === 0L,
        "stopped pipeline shows zero running queries")
      s.sql("DROP PIPELINE pcont").collect()
    }
  }

  test("EXTERNAL source + APPLY CHANGES FROM SNAPSHOT edge through SQL") {
    val root = tmp("graft_psql_snap")
    GraftSession.withSqlExtensions(spark) { s =>
      ManifestTable.write(
        Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), s"$root/src")
      s.sql(
        s"""CREATE PIPELINE psnap AS
            TABLE src AT '$root/src' EXTERNAL ;
            TABLE dim AT '$root/dim'
              APPLY CHANGES FROM SNAPSHOT src KEYS (id)""").collect()
      val r1 = s.sql("REFRESH PIPELINE psnap RUN 1").collect()
      assert(r1.map(_.getString(2)).toSeq === Seq("source", "applied"))
      // the source is REPLACED out-of-band: 1 deleted, 3 inserted
      ManifestTable.write(
        Seq((2L, "b"), (3L, "c")).toDF("id", "attr"), s"$root/src")
      s.sql("REFRESH PIPELINE psnap RUN 2").collect()
      val dim = ManifestTable.read(s, s"$root/dim")
        .select("id", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(dim === Seq((2L, "b"), (3L, "c")))
      s.sql("DROP PIPELINE psnap").collect()
    }
  }
}
