package graft

import graft.pipeline.ManifestTable
import graft.pipeline.ManifestTable.{MergeDelete, MergeInsert, MergeUpdate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Composite-key MERGE (round-15, the top round-14 gap): multi-column
  * equi-keys through every entry point — `mergeKeyed`,
  * `mergeMultiKeyed`, the fluent builder, and SQL
  * `ON t.k1 = s.k1 AND t.k2 = s.k2` — plus the non-equi RESIDUAL
  * remainder of the ON condition and the keyed-carry semantics it
  * forces (a key split into acted + surviving rows must carry the
  * survivors verbatim, never lose them).
  */
class MergeCompositeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private lazy val sqlSession: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
  private def withSql[A](f: SparkSession => A): A = {
    val base = spark
    val s = sqlSession
    SparkSession.setActiveSession(s)
    SparkSession.setDefaultSession(s)
    try f(s)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def rows(path: String): Seq[(Long, String, Long)] =
    ManifestTable.read(spark, path)
      .select("k1", "k2", "v").as[(Long, String, Long)]
      .collect().sortBy(t => (t._1, t._2)).toSeq

  test("mergeKeyed: composite-key upsert (CoW) — update matched, insert new, carry the rest") {
    val path = tmp("graft_ck1")
    ManifestTable.write(
      Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L), (2L, "b", 40L))
        .toDF("k1", "k2", "v"), path)
    // (1,b) updates; (3,a) inserts; (1,a)/(2,*) carry untouched —
    // single-column key semantics would WRONGLY match all of k1=1
    ManifestTable.mergeKeyed(
      Seq((1L, "b", 99L), (3L, "a", 70L)).toDF("k1", "k2", "v"),
      path, Seq("k1", "k2"))
    assert(rows(path) === Seq((1L, "a", 10L), (1L, "b", 99L),
      (2L, "a", 30L), (2L, "b", 40L), (3L, "a", 70L)))
  }

  test("mergeKeyed: composite prune intersects per-column ranges; NULL key components never match") {
    val path = tmp("graft_ck2")
    ManifestTable.write(
      (1L to 100L).map(i => (i, i % 7, i * 10L)).toDF("k1", "k2", "v")
        .repartition(8, col("k1")), path)
    // a null component on the source side inserts (SQL equality)
    ManifestTable.mergeKeyed(
      Seq((Some(5L), Some(5L % 7), 777L),
          (None: Option[Long], Some(3L), 888L))
        .toDF("k1", "k2", "v"), path, Seq("k1", "k2"))
    val got = ManifestTable.read(spark, path)
      .select("k1", "k2", "v").as[(Option[Long], Option[Long], Long)]
      .collect()
    assert(got.count(_._1.isEmpty) === 1, "null-key row inserted")
    assert(got.find(r => r._1.contains(5L) && r._2.contains(5L % 7))
      .map(_._3) === Some(777L))
    assert(got.length === 101)
  }

  test("mergeKeyed: composite deletion vectors — sidecar keyed on both columns, read + compact fold") {
    val path = tmp("graft_ck3")
    ManifestTable.write(
      Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L))
        .toDF("k1", "k2", "v"), path)
    // delete-only composite merge under MoR: zero data files rewrite
    ManifestTable.mergeKeyed(
      Seq((1L, "a", 0L)).toDF("k1", "k2", "v")
        .withColumn("_del", lit(true)),
      path, Seq("k1", "k2"), deleteCol = Some("_del"),
      deleteVectors = true)
    assert(rows(path) === Seq((1L, "b", 20L), (2L, "a", 30L)),
      "(1,a) DV-deleted; (1,b) survives — single-key DVs would kill it")
    // compact folds the DV away; content identical
    ManifestTable.compact(spark, path)
    assert(rows(path) === Seq((1L, "b", 20L), (2L, "a", 30L)))
  }

  test("mergeMultiKeyed: composite clauses + by-source + SQL ON conjunction") {
    val path = tmp("graft_ck4")
    ManifestTable.write(
      Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L), (9L, "z", 900L))
        .toDF("k1", "k2", "v"), path)
    withSql { s =>
      s.createDataFrame(Seq((1L, "a", 11L), (1L, "b", 5L), (4L, "d", 44L)))
        .toDF("k1", "k2", "v").createOrReplaceTempView("ck_src")
      s.sql(
        s"""MERGE INTO '$path' AS t USING ck_src AS s
            ON t.k1 = s.k1 AND t.k2 = s.k2
            WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
            WHEN MATCHED THEN DELETE
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND t.v > 100 THEN DELETE""")
    }
    // (1,a): 11 > 10 -> updated; (1,b): 5 < 20 -> deleted; (4,d)
    // inserted; (9,z) by-source deleted; (2,a) by-source but v<=100
    assert(rows(path) === Seq((1L, "a", 11L), (2L, "a", 30L),
      (4L, "d", 44L)))
  }

  test("RESIDUAL ON: a key-equal pair failing the residual inserts the source row and keeps the target row (engine + SQL)") {
    val path = tmp("graft_ck5")
    ManifestTable.write(
      Seq((1L, 10L, "old"), (2L, 10L, "old")).toDF("id", "ver", "w"), path)
    // residual withholds id=1 (source ver NOT newer): source row
    // inserts, target survives -> the table legitimately holds TWO
    // id=1 rows after the merge. id=2 matches fully and updates.
    ManifestTable.mergeMultiKeyed(
      Seq((1L, 5L, "new"), (2L, 20L, "new")).toDF("id", "ver", "w"),
      path, Seq("id"),
      matched = Seq(MergeUpdate()),
      notMatched = Seq(MergeInsert()),
      residual = Some(col("ver") > col("_b_ver")))
    val got = ManifestTable.read(spark, path)
      .select("id", "ver", "w").as[(Long, Long, String)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq((1L, 5L, "new"), (1L, 10L, "old"),
      (2L, 20L, "new")))
    // same shape through SQL's ON conjunction
    val p2 = tmp("graft_ck5b")
    ManifestTable.write(
      Seq((1L, 10L, "old"), (2L, 10L, "old")).toDF("id", "ver", "w"), p2)
    withSql { s =>
      s.createDataFrame(Seq((1L, 5L, "new"), (2L, 20L, "new")))
        .toDF("id", "ver", "w").createOrReplaceTempView("res_src")
      s.sql(
        s"""MERGE INTO '$p2' AS t USING res_src AS s
            ON t.id = s.id AND s.ver > t.ver
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
      val got2 = ManifestTable.read(s, p2)
        .select("id", "ver", "w").as[(Long, Long, String)]
        .collect().sortBy(t => (t._1, t._2)).toSeq
      assert(got2 === Seq((1L, 5L, "new"), (1L, 10L, "old"),
        (2L, 20L, "new")))
    }
  }

  test("RESIDUAL ON: residual-failed target rows reach the BY SOURCE clauses (Delta's full-ON reading)") {
    val path = tmp("graft_ck6")
    ManifestTable.write(
      Seq((1L, 10L, "x"), (2L, 10L, "x"), (3L, 10L, "x"))
        .toDF("id", "ver", "w"), path)
    // id=1 matches fully (update); id=2 key-matches but residual
    // fails -> NOT matched by source -> by-source UPDATE marks it;
    // id=3 has no source row at all -> by-source too
    ManifestTable.mergeMultiKeyed(
      Seq((1L, 20L, "new"), (2L, 5L, "new")).toDF("id", "ver", "w"),
      path, Seq("id"),
      matched = Seq(MergeUpdate()),
      notMatched = Nil,
      notMatchedBySource = Seq(
        MergeUpdate(Some(col("_b_ver") === 10L),
          Seq("w" -> lit("STALE")))),
      residual = Some(col("ver") > col("_b_ver")))
    val got = ManifestTable.read(spark, path)
      .select("id", "ver", "w").as[(Long, Long, String)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq((1L, 20L, "new"), (2L, 10L, "STALE"),
      (3L, 10L, "STALE")))
  }

  test("duplicate target keys: a conditional clause acting on ONE sibling carries the others verbatim (r15 carry fix)") {
    val path = tmp("graft_ck7")
    // two base rows share key 1 — a partial claim must not lose the
    // unclaimed sibling (pre-r15 the keyed carry dropped BOTH and
    // re-inserted only the claimed image)
    ManifestTable.write(
      Seq((1L, "keep", 10L), (1L, "hit", 20L), (2L, "keep", 30L))
        .toDF("id", "tagc", "v"), path)
    ManifestTable.mergeMultiKeyed(
      Seq((1L, "src", 0L)).toDF("id", "tagc", "v"),
      path, Seq("id"),
      matched = Seq(
        MergeUpdate(Some(col("_b_tagc") === "hit"),
          Seq("v" -> lit(999L)))),
      notMatched = Nil)
    val got = ManifestTable.read(spark, path)
      .select("id", "tagc", "v").as[(Long, String, Long)]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq((1L, "hit", 999L), (1L, "keep", 10L),
      (2L, "keep", 30L)),
      "claimed sibling updated; unclaimed sibling carried, not lost")
    // fully-withheld keys stay OUT of the rewrite entirely
    val before = ManifestTable.currentVersion(spark, path).get
    ManifestTable.mergeMultiKeyed(
      Seq((2L, "src", 0L)).toDF("id", "tagc", "v"),
      path, Seq("id"),
      matched = Seq(
        MergeUpdate(Some(col("_b_tagc") === "nope"),
          Seq("v" -> lit(1L)))),
      notMatched = Nil)
    assert(ManifestTable.read(spark, path).count() === 3)
    assert(ManifestTable.manifestFiles(spark, path,
        ManifestTable.currentVersion(spark, path).get).toSet ===
      ManifestTable.manifestFiles(spark, path, before).toSet,
      "no claim fired anywhere on the key -> zero files touched")
  }

  test("fluent builder: composite keys + onResidual") {
    val path = tmp("graft_ck8")
    ManifestTable.write(
      Seq((1L, "a", 10L), (1L, "b", 20L)).toDF("k1", "k2", "v"), path)
    graft.api.GraftTable.forPath(spark, path)
      .merge(Seq((1L, "a", 99L), (1L, "b", 1L)).toDF("k1", "k2", "v"),
        Seq("k1", "k2"))
      .onResidual(col("v") > col("_b_v"))
      .whenMatchedUpdateAll()
      .execute()
    assert(rows(path) === Seq((1L, "a", 99L), (1L, "b", 20L)),
      "(1,a) residual passes and updates; (1,b) withheld, no insert " +
        "clause, survives untouched")
  }

  test("guards: SET on a key column, comma/dup/empty keys, DV-key compatibility") {
    val path = tmp("graft_ck9")
    ManifestTable.write(
      Seq((1L, "a", 10L)).toDF("k1", "k2", "v"), path)
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.mergeMultiKeyed(
        Seq((1L, "a", 0L)).toDF("k1", "k2", "v"), path, Seq("k1", "k2"),
        matched = Seq(MergeUpdate(None, Seq("k2" -> lit("z")))),
        notMatched = Nil)
    }
    assert(e1.getMessage.contains("key column"), e1.getMessage)
    intercept[IllegalArgumentException] {
      ManifestTable.mergeKeyed(
        Seq((1L, "a", 0L)).toDF("k1", "k2", "v"), path, Nil)
    }
    intercept[IllegalArgumentException] {
      ManifestTable.mergeKeyed(
        Seq((1L, "a", 0L)).toDF("k1", "k2", "v"), path, Seq("k1", "k1"))
    }
    // live single-key DVs block a composite-keyed DV merge loudly
    ManifestTable.deleteWhereDV(spark, path, col("v") < 0L, "k1")
    // (no rows matched -> no DVs; force one)
    ManifestTable.write(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k1", "k2", "v"), path)
    ManifestTable.deleteWhereDV(spark, path, col("k1") === 2L, "k1")
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.mergeKeyed(
        Seq((1L, "a", 0L)).toDF("k1", "k2", "v")
          .withColumn("_del", lit(true)),
        path, Seq("k1", "k2"), deleteCol = Some("_del"),
        deleteVectors = true)
    }
    assert(e2.getMessage.contains("deletion vectors"), e2.getMessage)
  }

  test("row tracking: composite-key merge inherits stable row ids on the full key") {
    val p2 = tmp("graft_ck10")
    ManifestTable.enableRowTracking(spark, p2)
    ManifestTable.write(
      Seq((1L, "a", 10L), (1L, "b", 20L)).toDF("k1", "k2", "v"), p2)
    val idsBefore = ManifestTable.readWithRowIds(spark, p2)
      .select(col("k1"), col("k2"), col(ManifestTable.RowIdCol))
      .as[(Long, String, Long)].collect().map(t => (t._1, t._2) -> t._3)
      .toMap
    ManifestTable.mergeKeyed(
      Seq((1L, "b", 99L), (2L, "c", 30L)).toDF("k1", "k2", "v"),
      p2, Seq("k1", "k2"))
    val after = ManifestTable.readWithRowIds(spark, p2)
      .select(col("k1"), col("k2"), col(ManifestTable.RowIdCol))
      .as[(Long, String, Long)].collect().map(t => (t._1, t._2) -> t._3)
      .toMap
    assert(after((1L, "b")) === idsBefore((1L, "b")),
      "updated row keeps its stable id on the COMPOSITE key")
    assert(after((1L, "a")) === idsBefore((1L, "a")))
    assert(!idsBefore.values.toSet.contains(after((2L, "c"))),
      "inserted row draws a fresh id")
  }

  test("CDF: a composite-key merge classifies update pre/post images on the full key") {
    val path = tmp("graft_ck11")
    ManifestTable.write(
      Seq((1L, "a", 10L), (1L, "b", 20L)).toDF("k1", "k2", "v"), path)
    ManifestTable.mergeKeyed(
      Seq((1L, "b", 99L), (3L, "c", 70L)).toDF("k1", "k2", "v"),
      path, Seq("k1", "k2"))
    val v = ManifestTable.currentVersion(spark, path).get
    val ch = ManifestTable.changesBetween(spark, path, v, v,
        updateImages = true)
      .select("k1", "k2", "v", "_change").as[(Long, String, Long, String)]
      .collect().toSet
    assert(ch === Set((1L, "b", 20L, "update_preimage"),
      (1L, "b", 99L, "update_postimage"), (3L, "c", 70L, "insert")),
      s"got $ch — (1,a) carried verbatim cancels; a single-column " +
        "classifier would have mis-paired the k1=1 rows")
  }

  test("SET k = s.k no-op re-assignment is permitted (delta/tooling parity); genuine re-keys refuse") {
    val path = tmp("graft_ck12")
    ManifestTable.write(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), path)
    // auto-generated SET lists commonly include the key verbatim —
    // `SET id = s.id` is a no-op (keys are equal by the ON clause)
    ManifestTable.mergeMultiKeyed(
      Seq((2L, 99L)).toDF("id", "v"), path, Seq("id"),
      matched = Seq(MergeUpdate(None,
        Seq("id" -> col("id"), "v" -> col("v")))),
      notMatched = Nil)
    assert(ManifestTable.read(spark, path)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq ===
      Seq((1L, 10L), (2L, 99L)))
    // the base-value spelling is a no-op too
    ManifestTable.mergeMultiKeyed(
      Seq((2L, 77L)).toDF("id", "v"), path, Seq("id"),
      matched = Seq(MergeUpdate(None,
        Seq("id" -> col("_b_id"), "v" -> col("v")))),
      notMatched = Nil)
    assert(ManifestTable.read(spark, path).filter($"id" === 2L)
      .select("v").as[Long].head() === 77L)
    // a genuinely RE-KEYING expression still refuses loudly
    val ex = intercept[Exception] {
      ManifestTable.mergeMultiKeyed(
        Seq((2L, 5L)).toDF("id", "v"), path, Seq("id"),
        matched = Seq(MergeUpdate(None,
          Seq("id" -> (col("id") + 1L), "v" -> col("v")))),
        notMatched = Nil)
    }
    assert(ex.getMessage.contains("re-key"), ex.getMessage)
    // assigning a DIFFERENT column's value to the key refuses too
    val ex2 = intercept[Exception] {
      ManifestTable.mergeMultiKeyed(
        Seq((2L, 5L)).toDF("id", "v"), path, Seq("id"),
        matched = Seq(MergeUpdate(None, Seq("id" -> col("v")))),
        notMatched = Nil)
    }
    assert(ex2.getMessage.contains("re-key"), ex2.getMessage)
  }
}
