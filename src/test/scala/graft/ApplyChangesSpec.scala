package graft

import graft.pipeline.{ApplyChanges, ManifestTable, Scd2}
import org.apache.spark.sql.functions._

/** Declarative CDC apply (round 17 — the DLT APPLY CHANGES verb over
  * the engine MERGE): sequence-ordered SCD1 with in-batch
  * latest-event reduction, cross-batch late-arrival guard, delete
  * events, and the SCD2 delegation.
  */
class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/dim"

  private def state(path: String): Seq[(Long, String, Long)] =
    ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_seq"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  private def cdc(rows: (Long, String, Long, Boolean)*) =
    rows.toDF("id", "attr", "seq", "del")

  test("SCD1: in-batch out-of-order events reduce to the latest per key") {
    val path = tmp("graft_ac_a")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, 0L)
    // id=1 receives seq 7 then (listed first) seq 3 — 7 must win;
    // id=2 receives a single seq 5 update; id=9 is a NEW key whose
    // stale and fresh inserts race — fresh wins
    ApplyChanges.applyScd1(spark, path, "id",
      cdc((1L, "a_stale", 3L, false), (1L, "a_fresh", 7L, false),
        (2L, "b2", 5L, false),
        (9L, "i_stale", 1L, false), (9L, "i_fresh", 4L, false)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    assert(state(path) === Seq(
      (1L, "a_fresh", 7L), (2L, "b2", 5L), (9L, "i_fresh", 4L)))
  }

  test("SCD1: cross-batch late arrivals are ignored; newer ones apply") {
    val path = tmp("graft_ac_b")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, 0L)
    ApplyChanges.applyScd1(spark, path, "id",
      cdc((1L, "a10", 10L, false)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    // the LATE batch: seq 4 for id=1 (already at 10: ignored) and
    // id=2 (at 0: applies)
    ApplyChanges.applyScd1(spark, path, "id",
      cdc((1L, "a_late", 4L, false), (2L, "b4", 4L, false)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    assert(state(path) === Seq((1L, "a10", 10L), (2L, "b4", 4L)))
    // an EQUAL sequence does not re-apply either (strictly-newer
    // contract — replays are idempotent)
    ApplyChanges.applyScd1(spark, path, "id",
      cdc((2L, "b_replay", 4L, false)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    assert(state(path) === Seq((1L, "a10", 10L), (2L, "b4", 4L)))
  }

  test("SCD1: deletes — latest-op delete removes, delete outranks same-seq update, absent-key delete no-ops") {
    val path = tmp("graft_ac_c")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), path, 0L)
    ApplyChanges.applyScd1(spark, path, "id",
      cdc(
        // id=1: update seq 2 then delete seq 9 — delete wins
        (1L, "a2", 2L, false), (1L, "a2", 9L, true),
        // id=2: update and delete at the SAME seq — delete outranks
        (2L, "b2", 5L, false), (2L, "b2", 5L, true),
        // id=8: delete for a key the target never had — no-op
        (8L, "x", 3L, true)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    assert(state(path) === Seq((3L, "c", 0L)))
    // a LATE update for a deleted key re-inserts only if newer than
    // nothing — the key is gone, so any upsert recreates it (DLT's
    // SCD1 reading: the target holds no tombstone)
    ApplyChanges.applyScd1(spark, path, "id",
      cdc((1L, "a_back", 1L, false)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    assert(state(path) === Seq((1L, "a_back", 1L), (3L, "c", 0L)))
  }

  test("SQL verb: APPLY CHANGES INTO parses and applies — SCD1 with DELETE WHEN, SCD2 with TRACK HISTORY") {
    val p1 = tmp("graft_ac_sql1")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), p1, 0L)
    GraftSession.withSqlExtensions(spark) { s =>
      // temp views are SESSION-scoped: frames must bind to the
      // extended sibling, not the outer test session
      def cdcOn(rows: Seq[(Long, String, Long, Boolean)]) =
        s.createDataFrame(rows).toDF("id", "attr", "seq", "del")
      cdcOn(Seq((1L, "a9", 9L, false), (1L, "a3", 3L, false),
        (2L, "b", 5L, true))).createOrReplaceTempView("ac_sql_src")
      val v = s.sql(s"""APPLY CHANGES INTO '$p1' FROM ac_sql_src
                        KEYS (id) SEQUENCE BY seq
                        APPLY AS DELETE WHEN del
                        STORED AS SCD TYPE 1""").collect()
      assert(v.head.getLong(0) >= 1L)
      assert(state(p1) === Seq((1L, "a9", 9L)))
      // subquery source + default storage (SCD TYPE 1 implied)
      s.sql(s"""APPLY CHANGES INTO '$p1'
                FROM (SELECT 7 AS id, 'g' AS attr, 2 AS seq,
                             false AS del)
                KEYS (id) SEQUENCE BY seq""").collect()
      assert(state(p1) === Seq((1L, "a9", 9L), (7L, "g", 2L)))
      // SCD TYPE 2 spelling delegates to the history engine
      val p2 = tmp("graft_ac_sql2")
      Scd2.initialize(Seq((1L, "a")).toDF("id", "attr"), p2, 0L)
      cdcOn(Seq((1L, "a_old", 1L, false), (1L, "a_new", 8L, false)))
        .drop("del").createOrReplaceTempView("ac_sql_src2")
      s.sql(s"""APPLY CHANGES INTO '$p2' FROM ac_sql_src2
                KEYS (id) SEQUENCE BY seq
                STORED AS SCD TYPE 2 TRACK HISTORY ON (attr) AT 1""")
        .collect()
      val hist = ManifestTable.read(s, p2)
        .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
        .as[(Long, String, Long, Option[Long])]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      assert(hist === Seq(
        (1L, "a", 0L, Some(1L)), (1L, "a_new", 1L, None)))
      // clause-head words INSIDE string literals are data, not
      // boundaries: DELETE WHEN compares against a literal that
      // spells 'STORED AS SCD TYPE 1' and the statement still parses
      // with the real STORED AS clause intact
      val p3 = tmp("graft_ac_sql3")
      ApplyChanges.initializeScd1(
        s.createDataFrame(Seq((1L, "keep"), (2L, "STORED AS SCD TYPE 1")))
          .toDF("id", "attr"), p3, 0L)
      cdcOn(Seq((1L, "keep", 3L, false),
        (2L, "STORED AS SCD TYPE 1", 3L, false)))
        .createOrReplaceTempView("ac_sql_src3")
      s.sql(s"""APPLY CHANGES INTO '$p3' FROM ac_sql_src3
                KEYS (id) SEQUENCE BY seq
                APPLY AS DELETE WHEN attr = 'STORED AS SCD TYPE 1'
                STORED AS SCD TYPE 1""").collect()
      assert(state(p3) === Seq((1L, "keep", 3L)))
      // SCD TYPE 2 without TRACK HISTORY / AT refuses loudly
      val e = intercept[Exception] {
        s.sql(s"""APPLY CHANGES INTO '$p2' FROM ac_sql_src2
                  KEYS (id) SEQUENCE BY seq
                  STORED AS SCD TYPE 2""").collect()
      }
      assert(e.getMessage.contains("TRACK HISTORY"))
    }
  }

  test("SCD2 deletes: a delete event closes the open row with history retained; absent-key delete no-ops") {
    val path = tmp("graft_ac_e")
    Scd2.initialize(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), path, 0L)
    // id=1 changes at ts=1 (opens v2); id=2 unchanged
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a2", 5L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    // ts=2: delete id=1 (its v2 closes, v1 history carries), a stale
    // update for id=1 loses the in-batch race to the delete, delete
    // id=9 (absent) no-ops, id=3 unchanged rides along
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a2", 3L, false), (1L, "a2", 7L, true),
        (9L, "x", 1L, true), (3L, "c", 1L, false)),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 2L,
      deleteWhen = Some("del"))
    val rows = ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a2", 1L, Some(2L)),
      (2L, "b", 0L, None),
      (3L, "c", 0L, None)))
    // asOf(1) still reconstructs the pre-delete snapshot
    val at1 = Scd2.asOf(spark, path, 1L)
      .select(col("id"), col("attr")).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(at1 === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
    // SQL spelling: TYPE 2 with APPLY AS DELETE WHEN closes id=2
    GraftSession.withSqlExtensions(spark) { s =>
      s.createDataFrame(Seq((2L, "b", 4L, true)))
        .toDF("id", "attr", "seq", "del")
        .createOrReplaceTempView("ac_scd2_del_src")
      s.sql(s"""APPLY CHANGES INTO '$path' FROM ac_scd2_del_src
                KEYS (id) SEQUENCE BY seq
                APPLY AS DELETE WHEN del
                STORED AS SCD TYPE 2 TRACK HISTORY ON (attr) AT 3""")
        .collect()
      val openKeys = ManifestTable.read(s, path)
        .filter(col("_valid_to").isNull)
        .select(col("id")).as[Long].collect().sorted.toSeq
      assert(openKeys === Seq(3L))
      // TRACK HISTORY ON (*) — DLT's default: every non-key business
      // column tracks; id=3's attr change opens a version
      s.createDataFrame(Seq((3L, "c2", 9L, false)))
        .toDF("id", "attr", "seq", "del")
        .createOrReplaceTempView("ac_scd2_star_src")
      s.sql(s"""APPLY CHANGES INTO '$path' FROM ac_scd2_star_src
                KEYS (id) SEQUENCE BY seq
                STORED AS SCD TYPE 2 TRACK HISTORY ON (*) AT 4""")
        .collect()
      val v3 = ManifestTable.read(s, path)
        .filter(col("id") === 3L)
        .select(col("attr"), col("_valid_from"), col("_valid_to"))
        .as[(String, Long, Option[Long])]
        .collect().sortBy(_._2).toSeq
      assert(v3 === Seq(("c", 0L, Some(4L)), ("c2", 4L, None)))
    }
  }

  test("SCD1 late-prune scale gate: forced on, a late-heavy batch produces byte-identical state to the gated-off path") {
    def applyAll(path: String): Unit = {
      ApplyChanges.initializeScd1(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), path, 5L)
      // late update (seq 3 < 5), fresh update, late delete, fresh
      // delete, delete of absent key, insert of new key
      ApplyChanges.applyScd1(spark, path, "id",
        cdc((1L, "late", 3L, false), (2L, "fresh", 9L, false),
          (1L, "x", 2L, true), (3L, "y", 8L, true),
          (9L, "z", 7L, true), (4L, "d", 6L, false)),
        sequenceBy = "seq", deleteWhen = Some("del"))
    }
    val pOff = tmp("graft_lp_off")
    applyAll(pOff)
    val pOn = tmp("graft_lp_on")
    spark.conf.set("spark.graft.applyChanges.latePruneMinFiles", "1")
    try applyAll(pOn)
    finally spark.conf.unset("spark.graft.applyChanges.latePruneMinFiles")
    assert(state(pOn) === state(pOff))
    assert(state(pOn) === Seq((1L, "a", 5L), (2L, "fresh", 9L),
      (4L, "d", 6L)))
  }

  test("SCD2: a corrupted dimension with two open rows for one key fails loudly instead of picking one arbitrarily") {
    val path = tmp("graft_ac_corrupt")
    // two OPEN rows for id=1 — an invariant violation no apply could
    // produce; plant it directly (simulating external corruption)
    ManifestTable.write(
      Seq((1L, "a", Option.empty[Long], 0L, 0L),
          (1L, "b", Option.empty[Long], 0L, 0L),
          (2L, "c", Option.empty[Long], 0L, 0L))
        .toDF("id", "attr", Scd2.ValidTo, Scd2.ValidFrom, "_seq")
        .select(col("id"), col("attr"), col(Scd2.ValidFrom),
          col(Scd2.ValidTo).cast("long").as(Scd2.ValidTo), col("_seq")),
      path)
    val ex = intercept[Exception] {
      ApplyChanges.applyScd2(spark, path, "id",
        cdc((1L, "z", 9L, false)).drop("del"),
        tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    }
    assert(ex.getMessage.contains("more than one open row") ||
      Option(ex.getCause).exists(_.getMessage.contains("more than one open row")))
    // untouched keys don't trip the witness: a batch referencing only
    // the healthy key applies normally
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((2L, "c2", 9L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    val open2 = ManifestTable.read(spark, path)
      .filter(col("id") === 2L && col(Scd2.ValidTo).isNull)
      .select(col("attr")).as[String].collect().toSeq
    assert(open2 === Seq("c2"))
  }

  test("NULL business keys refuse loudly in both SCD forms — they can never match and would re-insert on every replay") {
    val nullKeyed = spark.sql(
      "SELECT CAST(null AS BIGINT) AS id, 'x' AS attr, " +
        "CAST(5 AS BIGINT) AS seq, false AS del")
    val p1 = tmp("graft_ac_nk1")
    ApplyChanges.initializeScd1(
      Seq((1L, "a")).toDF("id", "attr"), p1, 0L)
    val e1 = intercept[Exception] {
      ApplyChanges.applyScd1(spark, p1, "id", nullKeyed,
        sequenceBy = "seq", deleteWhen = Some("del"))
    }
    assert(e1.getMessage.contains("NULL 'id'") ||
      Option(e1.getCause).exists(_.getMessage.contains("NULL 'id'")))
    assert(state(p1) === Seq((1L, "a", 0L)), "failed batch commits nothing")
    val p2 = tmp("graft_ac_nk2")
    Scd2.initialize(Seq((1L, "a")).toDF("id", "attr"), p2, 0L)
    val e2 = intercept[Exception] {
      ApplyChanges.applyScd2(spark, p2, "id", nullKeyed.drop("del"),
        tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    }
    assert(e2.getMessage.contains("NULL 'id'") ||
      Option(e2.getCause).exists(_.getMessage.contains("NULL 'id'")))
    // a null-keyed DELETE is a no-op like any absent key — no error
    ApplyChanges.applyScd2(spark, p2, "id",
      spark.sql("SELECT CAST(null AS BIGINT) AS id, 'x' AS attr, " +
        "CAST(5 AS BIGINT) AS seq, true AS del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 2L,
      deleteWhen = Some("del"))
  }

  test("SCD2 cross-batch ordering: late/replayed batches can neither open stale versions nor resurrect deleted keys") {
    val path = tmp("graft_ac_f")
    ApplyChanges.initializeScd2(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, ts = 0L, seq0 = 0L)
    // batch 1: id=1 advances to seq 10 at ts=1
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a10", 10L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    // batch 2 is LATE (seq 4 < the persisted high-water 10): it must
    // NOT close the open a10 row with a stale version — the ADVICE
    // r17 silent-history-corruption scenario; id=2 (high-water 0)
    // legitimately applies
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a_stale", 4L, false), (2L, "b4", 4L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 2L)
    def hist() = ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(hist() === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a10", 1L, None),
      (2L, "b", 0L, Some(2L)), (2L, "b4", 2L, None)))
    // a REPLAY of batch 1 (equal sequence) is idempotent — no new
    // version, no re-close
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a10", 10L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 3L)
    assert(hist() === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a10", 1L, None),
      (2L, "b", 0L, Some(2L)), (2L, "b4", 2L, None)))
    // delete id=1 at seq 20: the closed row RECORDS the delete's
    // sequence, so a late post-delete update (seq 15) cannot
    // resurrect the key
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a10", 20L, true)),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 4L,
      deleteWhen = Some("del"))
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a_zombie", 15L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 5L)
    assert(hist() === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a10", 1L, Some(4L)),
      (2L, "b", 0L, Some(2L)), (2L, "b4", 2L, None)),
      "a deleted key must not resurrect from a pre-delete sequence")
    // a GENUINELY newer event re-inserts the key (seq 25 > 20)
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a_back", 25L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 6L)
    assert(hist().contains((1L, "a_back", 6L, None)))
    // a legacy target (Scd2.initialize, no _seq) upgrades on its
    // first seq-aware apply: the column evolves, pre-upgrade rows
    // read NULL high-water and stay open to any sequence
    val legacy = tmp("graft_ac_g")
    Scd2.initialize(Seq((7L, "x")).toDF("id", "attr"), legacy, 0L)
    ApplyChanges.applyScd2(spark, legacy, "id",
      cdc((7L, "x2", 3L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    assert(ManifestTable.read(spark, legacy).columns.contains("_seq"))
    ApplyChanges.applyScd2(spark, legacy, "id",
      cdc((7L, "x_stale", 1L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 2L)
    val leg = ManifestTable.read(spark, legacy)
      .filter(col("_valid_to").isNull)
      .select(col("attr")).as[String].collect().toSeq
    assert(leg === Seq("x2"), "post-upgrade high-water must gate")
  }

  test("NULL sequenceBy values refuse loudly in both SCD forms") {
    val p1 = tmp("graft_ac_ns1")
    ApplyChanges.initializeScd1(
      Seq((1L, "a")).toDF("id", "attr"), p1, 0L)
    val nullSeq = spark.sql(
      "SELECT CAST(1 AS BIGINT) AS id, 'x' AS attr, " +
        "CAST(null AS BIGINT) AS seq, false AS del")
    val e1 = intercept[Exception] {
      ApplyChanges.applyScd1(spark, p1, "id", nullSeq,
        sequenceBy = "seq", deleteWhen = Some("del"))
    }
    assert(e1.getMessage.contains("NULL 'seq'") ||
      Option(e1.getCause).exists(_.getMessage.contains("NULL 'seq'")))
    assert(state(p1) === Seq((1L, "a", 0L)))
    val p2 = tmp("graft_ac_ns2")
    ApplyChanges.initializeScd2(
      Seq((1L, "a")).toDF("id", "attr"), p2, ts = 0L, seq0 = 0L)
    val e2 = intercept[Exception] {
      ApplyChanges.applyScd2(spark, p2, "id", nullSeq.drop("del"),
        tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    }
    assert(e2.getMessage.contains("NULL 'seq'") ||
      Option(e2.getCause).exists(_.getMessage.contains("NULL 'seq'")))
  }

  test("APPLY AS TRUNCATE WHEN: full truncate at the truncate sequence, strictly-newer events reapply, replay idempotent — SCD1 only") {
    val path = tmp("graft_ac_t")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), path, 0L)
    // one batch: truncate at seq 5; id=1's seq-3 update predates the
    // truncate (consumed by it), id=2's seq-8 update survives, a
    // truncate event's own row never applies as data
    val batch = Seq(
      (1L, "a3", 3L, false, false),
      (9L, "trunc", 5L, false, true),
      (2L, "b8", 8L, false, false))
      .toDF("id", "attr", "seq", "del", "trunc")
    ApplyChanges.applyScd1(spark, path, "id", batch,
      sequenceBy = "seq", deleteWhen = Some("del"),
      truncateWhen = Some("trunc"))
    assert(state(path) === Seq((2L, "b8", 8L)))
    // replaying the same batch reproduces the same state (idempotent
    // by value: re-truncate + re-apply)
    ApplyChanges.applyScd1(spark, path, "id", batch,
      sequenceBy = "seq", deleteWhen = Some("del"),
      truncateWhen = Some("trunc"))
    assert(state(path) === Seq((2L, "b8", 8L)))
    // a batch with the flag column but NO firing event applies
    // normally — no truncate
    ApplyChanges.applyScd1(spark, path, "id",
      Seq((3L, "c9", 9L, false, false))
        .toDF("id", "attr", "seq", "del", "trunc"),
      sequenceBy = "seq", deleteWhen = Some("del"),
      truncateWhen = Some("trunc"))
    assert(state(path) === Seq((2L, "b8", 8L), (3L, "c9", 9L)))
    // SQL spelling, and the SCD TYPE 2 refusal
    GraftSession.withSqlExtensions(spark) { s =>
      s.createDataFrame(Seq((5L, "e", 20L, false, true)))
        .toDF("id", "attr", "seq", "del", "trunc")
        .createOrReplaceTempView("ac_trunc_src")
      s.sql(s"""APPLY CHANGES INTO '$path' FROM ac_trunc_src
                KEYS (id) SEQUENCE BY seq
                APPLY AS DELETE WHEN del
                APPLY AS TRUNCATE WHEN trunc
                STORED AS SCD TYPE 1""").collect()
      assert(state(path) === Seq.empty,
        "a truncate with no newer events leaves the table empty")
      val e = intercept[Exception] {
        s.sql(s"""APPLY CHANGES INTO '$path' FROM ac_trunc_src
                  KEYS (id) SEQUENCE BY seq
                  APPLY AS TRUNCATE WHEN trunc
                  STORED AS SCD TYPE 2 TRACK HISTORY ON (attr) AT 9""")
          .collect()
      }
      assert(e.getMessage.contains("SCD TYPE 1 only"))
    }
  }

  test("SCHEMA EVOLUTION: a CDC feed that gained a column evolves the SCD1 target; control columns never become business columns") {
    val path = tmp("graft_acse")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, 0L)
    // the feed gains 'city': without evolution the extra column is
    // ignored (target schema unchanged)
    val withCity = Seq((1L, "a1", 1L, false, "nyc"))
      .toDF("id", "attr", "seq", "del", "city")
    ApplyChanges.applyScd1(spark, path, "id", withCity,
      sequenceBy = "seq", deleteWhen = Some("del"))
    assert(!ManifestTable.read(spark, path).columns.contains("city"))
    // with evolution the column lands; untouched rows read NULL
    ApplyChanges.applyScd1(spark, path, "id",
      Seq((1L, "a2", 2L, false, "sf"), (9L, "i", 2L, false, "la"))
        .toDF("id", "attr", "seq", "del", "city"),
      sequenceBy = "seq", deleteWhen = Some("del"),
      schemaEvolution = true)
    val got = ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("city"))
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a2", Some("sf")), (2L, "b", None),
      (9L, "i", Some("la"))))
    // the sequence/delete control columns never evolved in
    assert(!ManifestTable.read(spark, path).columns.contains("seq"))
    assert(!ManifestTable.read(spark, path).columns.contains("del"))
    // SQL spelling + the TYPE 2 refusal
    GraftSession.withSqlExtensions(spark) { s =>
      s.createDataFrame(Seq((2L, "b9", 9L, false, "chi", 7.5)))
        .toDF("id", "attr", "seq", "del", "city", "score")
        .createOrReplaceTempView("ac_se_src")
      s.sql(s"""APPLY CHANGES WITH SCHEMA EVOLUTION INTO '$path'
                FROM ac_se_src KEYS (id) SEQUENCE BY seq
                APPLY AS DELETE WHEN del
                STORED AS SCD TYPE 1""").collect()
      val r2 = ManifestTable.read(s, path).filter(col("id") === 2L)
        .select(col("attr"), col("city"), col("score"))
        .head()
      assert(r2.getString(0) === "b9" && r2.getString(1) === "chi" &&
        r2.getDouble(2) === 7.5)
      val e = intercept[Exception] {
        s.sql(s"""APPLY CHANGES WITH SCHEMA EVOLUTION INTO '$path'
                  FROM ac_se_src KEYS (id) SEQUENCE BY seq
                  STORED AS SCD TYPE 2 TRACK HISTORY ON (attr) AT 1""")
          .collect()
      }
      assert(e.getMessage.contains("SCD TYPE 1 only"))
    }
  }

  test("FROM SNAPSHOT, SCD1: diff-derived inserts/updates/deletes apply; unchanged keys emit nothing; replay and stale snapshots no-op") {
    val path = tmp("graft_acfs1")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), path, 0L)
    // snapshot 1: id=1 changed, id=2 unchanged, id=3 GONE, id=9 new
    val snap1 = Seq((1L, "a2"), (2L, "b"), (9L, "i")).toDF("id", "attr")
    ApplyChanges.applyScd1FromSnapshot(spark, path, "id", snap1, 1L)
    assert(state(path) === Seq((1L, "a2", 1L), (2L, "b", 0L), (9L, "i", 1L)))
    // replaying the SAME snapshot derives an EMPTY change set
    ApplyChanges.applyScd1FromSnapshot(spark, path, "id", snap1, 1L)
    assert(state(path) === Seq((1L, "a2", 1L), (2L, "b", 0L), (9L, "i", 1L)))
    // a STALE snapshot (an older version arriving late) is gated by
    // the sequence high-water for keys it would move backward
    ApplyChanges.applyScd1FromSnapshot(spark, path, "id",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), 0L)
    assert(state(path).filter(_._1 == 1L) === Seq((1L, "a2", 1L)),
      "a late stale snapshot must not roll a key backward")
  }

  test("FROM SNAPSHOT, SCD2: departures close open rows with history; changes close+reopen; diff runs against the OPEN slice only") {
    val path = tmp("graft_acfs2")
    ApplyChanges.initializeScd2(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, ts = 0L, seq0 = 0L)
    // snapshot 1 at ts=1: id=1 changes, id=2 leaves, id=5 arrives
    ApplyChanges.applyScd2FromSnapshot(spark, path, "id",
      Seq((1L, "a2"), (5L, "e")).toDF("id", "attr"),
      tracked = Seq("attr"), snapshotSeq = 1L, ts = 1L)
    def hist() = ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(hist() === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a2", 1L, None),
      (2L, "b", 0L, Some(1L)),
      (5L, "e", 1L, None)))
    // snapshot 2 at ts=2: identical population — closed history must
    // NOT re-enter the diff (id=2's closed row is not "present")
    ApplyChanges.applyScd2FromSnapshot(spark, path, "id",
      Seq((1L, "a2"), (5L, "e")).toDF("id", "attr"),
      tracked = Seq("attr"), snapshotSeq = 2L, ts = 2L)
    assert(hist() === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a2", 1L, None),
      (2L, "b", 0L, Some(1L)),
      (5L, "e", 1L, None)), "an identical snapshot must change nothing")
  }

  test("SCD2 delegation: the reduction feeds Scd2.applyChanges — out-of-order events open ONE version") {
    val path = tmp("graft_ac_d")
    Scd2.initialize(Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, 0L)
    // id=1's stale (seq 1) and fresh (seq 6) changes arrive in one
    // batch: only the fresh image may open a version; id=2 unchanged
    ApplyChanges.applyScd2(spark, path, "id",
      cdc((1L, "a_stale", 1L, false), (1L, "a_fresh", 6L, false),
        (2L, "b", 2L, false)).drop("del"),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 1L)
    val rows = ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a_fresh", 1L, None),
      (2L, "b", 0L, None)))
  }

  test("generated columns compose: APPLY CHANGES into a generated-column target recomputes, never assigns — both SCD types") {
    // SCD1: target carries attr_up GENERATED AS upper(attr); the CDC
    // feed carries only the business columns — the merge must
    // recompute the generated column on update and insert (r18's
    // no-assigning rule would refuse a feed-enumerated assignment)
    val p1 = tmp("graft_ac_gen1")
    ManifestTable.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr")
        .withColumn("attr_up", expr("upper(attr)"))
        .withColumn("_seq", lit(0L)),
      p1, generatedAdds = Map("attr_up" -> "upper(attr)"))
    ApplyChanges.applyScd1(spark, p1, "id",
      cdc((1L, "fresh", 5L, false), (9L, "new", 5L, false)),
      sequenceBy = "seq", deleteWhen = Some("del"))
    val got1 = ManifestTable.read(spark, p1)
      .select(col("id"), col("attr"), col("attr_up"), col("_seq"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got1 === Seq((1L, "fresh", "FRESH", 5L),
      (2L, "b", "B", 0L), (9L, "new", "NEW", 5L)))
    // SCD2: same composition through the history-keeping verb — the
    // replacement open row and the brand-new key both recompute
    val p2 = tmp("graft_ac_gen2")
    ManifestTable.write(
      Seq((1L, "a")).toDF("id", "attr")
        .withColumn("attr_up", expr("upper(attr)"))
        .withColumn(Scd2.ValidFrom, lit(0L))
        .withColumn(Scd2.ValidTo, lit(null).cast("long"))
        .withColumn("_seq", lit(0L)),
      p2, generatedAdds = Map("attr_up" -> "upper(attr)"))
    ApplyChanges.applyScd2(spark, p2, "id",
      cdc((1L, "a2", 3L, false), (7L, "n", 3L, false)),
      tracked = Seq("attr"), sequenceBy = "seq", ts = 1L,
      deleteWhen = Some("del"))
    val got2 = ManifestTable.read(spark, p2)
      .select(col("id"), col("attr"), col("attr_up"),
        col(Scd2.ValidTo))
      .as[(Long, String, String, Option[Long])].collect()
      .sortBy(r => (r._1, r._4.getOrElse(Long.MaxValue))).toSeq
    assert(got2 === Seq(
      (1L, "a", "A", Some(1L)), (1L, "a2", "A2", None),
      (7L, "n", "N", None)))
  }

  test("NULL sequence fails loudly on the truncate path and beside a non-NULL sibling of the same key") {
    // sibling case: the desc sort parks NULL last — pre-r19 the
    // NULL-seq event silently vanished whenever the key had any
    // non-NULL event; now EVERY NULL fails the batch
    val p1 = tmp("graft_ac_nsib")
    ApplyChanges.initializeScd1(
      Seq((1L, "a")).toDF("id", "attr"), p1, 0L)
    val sib = Seq((1L, "x", Some(5L), false),
      (1L, "y", None: Option[Long], false))
      .toDF("id", "attr", "seq", "del")
    val e1 = intercept[Exception] {
      ApplyChanges.applyScd1(spark, p1, "id", sib,
        sequenceBy = "seq", deleteWhen = Some("del"))
    }
    assert(e1.getMessage.contains("NULL 'seq'") ||
      Option(e1.getCause).exists(_.getMessage.contains("NULL 'seq'")))
    assert(state(p1) === Seq((1L, "a", 0L)))
    // truncate path: pre-r19 the `> truncSeq` filter evaluated NULL
    // and silently dropped the event before any guard fired
    val p2 = tmp("graft_ac_ntr")
    ApplyChanges.initializeScd1(
      Seq((1L, "a")).toDF("id", "attr"), p2, 0L)
    val tb = Seq((9L, "t", Some(5L), false, true),
      (1L, "x", None: Option[Long], false, false))
      .toDF("id", "attr", "seq", "del", "trunc")
    val e2 = intercept[Exception] {
      ApplyChanges.applyScd1(spark, p2, "id", tb,
        sequenceBy = "seq", deleteWhen = Some("del"),
        truncateWhen = Some("trunc"))
    }
    assert(e2.getMessage.contains("NULL 'seq'") ||
      Option(e2.getCause).exists(_.getMessage.contains("NULL 'seq'")))
    // and the failed atomic truncate left the table UNTOUCHED — no
    // intermediate empty version ever committed
    assert(state(p2) === Seq((1L, "a", 0L)))
  }

  test("APPLY AS TRUNCATE WHEN is ONE atomic commit — exactly one new version, no empty intermediate state") {
    val path = tmp("graft_ac_t1c")
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, 0L)
    val before = ManifestTable.currentVersion(spark, path).get
    ApplyChanges.applyScd1(spark, path, "id",
      Seq((9L, "t", 5L, false, true), (2L, "b8", 8L, false, false))
        .toDF("id", "attr", "seq", "del", "trunc"),
      sequenceBy = "seq", deleteWhen = Some("del"),
      truncateWhen = Some("trunc"))
    val after = ManifestTable.currentVersion(spark, path).get
    assert(after === before + 1L,
      "truncate + reapply must land as ONE commit — a reader between " +
        "two commits would observe an empty dimension")
    assert(state(path) === Seq((2L, "b8", 8L)))
    // the version chain has no empty intermediate: the PREVIOUS
    // version still reads the pre-truncate state in full
    val prev = ManifestTable.readVersion(spark, path, before)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(prev === Seq(1L, 2L))
  }
}
