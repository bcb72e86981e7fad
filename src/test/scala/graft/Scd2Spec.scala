package graft

import graft.pipeline.{ManifestTable, Scd2}
import org.apache.spark.sql.functions._

/** SCD Type 2 maintenance (round-16): one atomic MERGE per batch
  * closes superseded open rows and inserts their replacements —
  * unchanged rows are no-ops, closed history carries verbatim, new
  * keys open their first version, and the point-in-time view
  * reconstructs any snapshot.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/dim"

  private def rows(path: String): Seq[(Long, String, Long, Option[Long])] =
    ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("lifecycle: change closes+reopens, unchanged no-ops, new key opens, history carries") {
    val path = tmp("graft_scd2a")
    Scd2.initialize(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "attr"), path, 0L)
    // ts=1: id=1 changes, id=2 arrives UNCHANGED, id=4 is NEW
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a2"), (2L, "b"), (4L, "d")).toDF("id", "attr"),
      tracked = Seq("attr"), ts = 1L)
    assert(rows(path) === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a2", 1L, None),
      (2L, "b", 0L, None),
      (3L, "c", 0L, None),
      (4L, "d", 1L, None)))
    // ts=2: id=1 changes AGAIN — its ts=0 closed row must carry
    // verbatim through the merge (keyed carry), id=4 unchanged
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a3"), (4L, "d")).toDF("id", "attr"),
      tracked = Seq("attr"), ts = 2L)
    assert(rows(path) === Seq(
      (1L, "a", 0L, Some(1L)), (1L, "a2", 1L, Some(2L)),
      (1L, "a3", 2L, None),
      (2L, "b", 0L, None),
      (3L, "c", 0L, None),
      (4L, "d", 1L, None)))
  }

  test("an all-unchanged batch leaves the content identical") {
    val path = tmp("graft_scd2b")
    Scd2.initialize(Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), path, 0L)
    val before = rows(path)
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"),
      tracked = Seq("attr"), ts = 5L)
    assert(rows(path) === before, "unchanged batch must be a no-op")
  }

  test("untracked columns ride the new version but never trigger one") {
    val path = tmp("graft_scd2c")
    Scd2.initialize(
      Seq((1L, "a", "note0")).toDF("id", "attr", "note"), path, 0L)
    // note changes but attr (the tracked column) does not: no-op
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a", "noteX")).toDF("id", "attr", "note"),
      tracked = Seq("attr"), ts = 1L)
    assert(ManifestTable.read(spark, path).count() === 1L)
    assert(ManifestTable.read(spark, path)
      .select("note").as[String].head() === "note0")
    // attr changes: the NEW row carries the batch's note value
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a2", "noteY")).toDF("id", "attr", "note"),
      tracked = Seq("attr"), ts = 2L)
    val got = ManifestTable.read(spark, path)
      .select(col("attr"), col("note"), col("_valid_to").isNull)
      .as[(String, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", "note0", false), ("a2", "noteY", true)))
  }

  test("asOf reconstructs any point-in-time snapshot") {
    val path = tmp("graft_scd2d")
    Scd2.initialize(Seq((1L, "a")).toDF("id", "attr"), path, 0L)
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a2")).toDF("id", "attr"), Seq("attr"), ts = 10L)
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, "a3")).toDF("id", "attr"), Seq("attr"), ts = 20L)
    def attrAt(ts: Long): String =
      Scd2.asOf(spark, path, ts).select("attr").as[String].head()
    assert(attrAt(0L) === "a")
    assert(attrAt(9L) === "a")
    assert(attrAt(10L) === "a2")
    assert(attrAt(19L) === "a2")
    assert(attrAt(25L) === "a3")
  }

  test("NULL-safe change detection: null<->value transitions open versions") {
    val path = tmp("graft_scd2e")
    Scd2.initialize(
      Seq((1L, Option.empty[String]), (2L, Some("x")))
        .toDF("id", "attr"), path, 0L)
    Scd2.applyChanges(spark, path, "id",
      Seq((1L, Some("y")), (2L, Option.empty[String]))
        .toDF("id", "attr"),
      tracked = Seq("attr"), ts = 1L)
    val got = ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_valid_to").isNull)
      .as[(Long, Option[String], Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(got === Seq(
      (1L, None, false), (1L, Some("y"), true),
      (2L, Some("x"), false), (2L, None, true)))
  }
}
