package graft

import graft.api.GraftTable
import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Round-13 fluent handle: the delta-spark `DeltaTable` API shape —
  * forPath/forName, update/delete, the merge builder, optimize,
  * restore, properties — every method a thin rename into the same
  * ManifestTable operators the SQL verbs drive.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("forPath/isGraftTable contract; update/updateExpr/delete land as CoW commits") {
    val p = tmp("graft_gt")
    assert(!GraftTable.isGraftTable(spark, p))
    intercept[IllegalArgumentException] { GraftTable.forPath(spark, p) }
    ManifestTable.write(
      Seq((1L, 10.0, "a"), (2L, -5.0, "a"), (3L, 7.0, "b"))
        .toDF("id", "v", "g"), p)
    val t = GraftTable.forPath(spark, p)
    assert(GraftTable.isGraftTable(spark, p) && t.version === 1L)

    t.update(col("v") < 0, Map("v" -> lit(0.0)))
    assert(t.toDF.filter(col("v") < 0).isEmpty)
    t.updateExpr("g = 'b'", Map("v" -> "v * 2"))
    assert(t.toDF.filter(col("id") === 3L).head().getDouble(1) === 14.0)
    t.delete(col("id") === 2L)
    assert(t.toDF.count() === 2)
    // history/time travel/detail read through the handle
    assert(t.version === 4L)
    assert(t.versionAsOf(1L).count() === 3)
    assert(t.history().count() === 4)
    assert(t.detail().select("num_files").head().getLong(0) >= 1)
  }

  test("merge builder: conditional update + delete + insert in ONE commit") {
    val p = tmp("graft_gt_m")
    ManifestTable.write(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"), p)
    val t = GraftTable.forPath(spark, p)
    val src = Seq((1L, 100.0), (2L, -1.0), (9L, 90.0)).toDF("id", "v")
    val v = t.merge(src, "id")
      .whenMatchedDelete(condition = Some(col("v") < 0)) // kills id=2
      .whenMatchedUpdateAll()                            // updates id=1
      .whenNotMatchedInsertAll()                         // inserts id=9
      .execute()
    assert(v === 2L, "one merge commit")
    assert(t.toDF.orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 100.0), (3L, 30.0), (9L, 90.0)))
  }

  test("merge builder: expression assignments and schema evolution") {
    val p = tmp("graft_gt_me")
    ManifestTable.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), p)
    val t = GraftTable.forPath(spark, p)
    t.merge(Seq((1L, 5.0)).toDF("id", "v"), "id")
      .whenMatchedUpdateExpr(Map("v" -> "_b_v + v"))  // target v + source v
      .execute()
    assert(t.toDF.filter(col("id") === 1L).head().getDouble(1) === 15.0)
    // additive source column evolves the table in the same commit
    t.merge(Seq((2L, 21.0, "x")).toDF("id", "v", "tag"), "id")
      .whenMatchedUpdateAll()
      .withSchemaEvolution()
      .execute()
    assert(t.toDF.columns.toSeq === Seq("id", "v", "tag"))
    val rows = t.toDF.orderBy("id").as[(Long, Double, Option[String])]
      .collect().toSeq
    assert(rows === Seq((1L, 15.0, None), (2L, 21.0, Some("x"))))
    // Delta's reachability rule: an unconditional clause must be the
    // LAST on its match side (a second one is unreachable)
    intercept[IllegalArgumentException] {
      t.merge(Seq((1L, 0.0, "y")).toDF("id", "v", "tag"), "id")
        .whenMatchedUpdateAll().whenMatchedUpdateAll().execute()
    }
  }

  test("multi-clause merge: first-clause-wins across two updates and a delete (r13)") {
    val p = tmp("graft_gt_mc")
    ManifestTable.write(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v"), p)
    val t = GraftTable.forPath(spark, p)
    // source hits all four targets + one unmatched
    val src = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (9L, 9.0))
      .toDF("id", "v")
    t.merge(src, "id")
      // clause 1 claims id=1 (base v = 10): v := 111
      .whenMatchedUpdateExpr(Map("v" -> "111.0"),
        condition = Some("_b_v = 10.0"))
      // clause 2 would ALSO match id=1 (src v <= 2) — but clause 1 won;
      // claims id=2: v := 222
      .whenMatchedUpdateExpr(Map("v" -> "222.0"),
        condition = Some("v <= 2.0"))
      // clause 3 claims id=3: delete
      .whenMatchedDelete(condition = Some(col("_b_v") === 30.0))
      // id=4 matches NO clause → withheld, base row survives untouched
      // two insert clauses: first claims src v > 100 (none), second all
      .whenNotMatchedInsert(Map("id" -> col("id"), "v" -> (col("v") * -1)),
        condition = Some(col("v") > 100))
      .whenNotMatchedInsertAll()
      .execute()
    assert(t.toDF.orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 111.0), (2L, 222.0), (4L, 40.0), (9L, 9.0)))
  }

  test("merge builder: whenNotMatchedBySource update/delete with a keys-only source (r14)") {
    val p = tmp("graft_gt_bys")
    ManifestTable.write(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "v"), p)
    val t = GraftTable.forPath(spark, p)
    // the delta-spark sync idiom: update matched, flag or delete the
    // rows the source no longer carries — narrow (keys-only) source
    t.merge(Seq((1L, 11L)).toDF("id", "v"), "id")
      .whenMatchedUpdateAll()
      .whenNotMatchedBySourceUpdate(Map("v" -> lit(-1L)),
        condition = Some(col("_b_v") < 35))
      .whenNotMatchedBySourceDelete()
      .execute()
    val got = t.toDF.select("id", "v").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 11L), (2L, -1L), (3L, -1L)))
  }

  test("deep clone through the handle: survives source drop (r14)") {
    val p = tmp("graft_gt_dc")
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), p)
    val dst = java.nio.file.Files.createTempDirectory("graft_gt_dc2")
      .toString + "/clone"
    GraftTable.forPath(spark, p).deepClone(dst)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(p))
    assert(GraftTable.forPath(spark, dst).toDF.count() === 2)
  }

  test("optimize builder: compaction, where-scoped compaction, zorder") {
    val p = tmp("graft_gt_o")
    ManifestTable.write(
      spark.range(0, 400).toDF("id")
        .withColumn("k1", col("id") % 20)
        .withColumn("k2", (col("id") * 7) % 20)
        .repartition(8),
      p, statsCols = Seq("k1", "k2"))
    val t = GraftTable.forPath(spark, p)
    val before = t.detail().select("num_files").head().getLong(0)
    assert(before === 8)
    t.optimize().executeCompaction()
    val after = t.detail().select("num_files").head().getLong(0)
    assert(after < before, s"compaction must shrink files: $before -> $after")
    t.optimize().executeZOrderBy("k1", "k2")
    assert(t.toDF.count() === 400)
    // zorder refuses where()
    intercept[IllegalArgumentException] {
      t.optimize().where("k1 = 3").executeZOrderBy("k1", "k2")
    }
  }

  test("restore, properties, constraints, shallow clone through the handle") {
    val p = tmp("graft_gt_r")
    ManifestTable.write(spark.range(0, 10).toDF("id"), p)
    val t = GraftTable.forPath(spark, p)
    t.setProperties(Map("owner" -> "core"))
    assert(t.properties === Map("owner" -> "core"))
    t.unsetProperties(Seq("owner"))
    assert(t.properties === Map.empty)
    t.addConstraint("id_pos", "id >= 0")
    intercept[Exception] {
      ManifestTable.append(Seq(-1L).toDF("id"), p)
    }
    t.dropConstraint("id_pos")
    ManifestTable.append(Seq(-1L).toDF("id"), p)
    t.restoreToVersion(1L)
    assert(t.toDF.count() === 10)
    val dst = tmp("graft_gt_r_dst")
    t.shallowClone(dst)
    assert(GraftTable.forPath(spark, dst).toDF.count() === 10)
    t.delete()
    assert(t.toDF.isEmpty)
  }
}
