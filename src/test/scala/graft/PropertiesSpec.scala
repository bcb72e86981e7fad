package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 TBLPROPERTIES: user table properties as declare-once
  * manifest state (SET/UNSET/SHOW verbs + Scala API), riding
  * checkpoints and rolling back through RESTORE; reserved `graft.`
  * keys route to engine features the way delta-spark routes `delta.*`.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

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
    try f(s)
    finally SparkSession.setActiveSession(base)
  }

  test("set/unset/read properties; no-op change commits nothing") {
    val p = tmp("graft_props")
    ManifestTable.write(spark.range(0, 10).toDF("id"), p)
    val v1 = ManifestTable.setProperties(spark, p,
      Map("owner" -> "data-eng", "pipeline" -> "gold"))
    assert(v1 === 2L)
    assert(ManifestTable.tableProperties(spark, p) ===
      Map("owner" -> "data-eng", "pipeline" -> "gold"))
    // same values again: no-op, NO new commit
    assert(ManifestTable.setProperties(spark, p,
      Map("owner" -> "data-eng")) === 2L)
    assert(ManifestTable.currentVersion(spark, p).get === 2L)
    // unset one; absent key is a no-op
    val v3 = ManifestTable.unsetProperties(spark, p, Seq("pipeline", "nope"))
    assert(v3 === 3L)
    assert(ManifestTable.tableProperties(spark, p) ===
      Map("owner" -> "data-eng"))
    // reserved prefix refused on the Scala API
    intercept[IllegalArgumentException] {
      ManifestTable.setProperties(spark, p, Map("graft.x" -> "1"))
    }
  }

  test("properties survive data commits, checkpoints, and roll back through RESTORE") {
    val p = tmp("graft_props_cp")
    ManifestTable.write(spark.range(0, 20).toDF("id"), p)
    ManifestTable.setProperties(spark, p, Map("k1" -> "a"))    // v2
    // enough appends to cross a checkpoint boundary
    (0 until 12).foreach(i =>
      ManifestTable.append(spark.range(100 + i, 101 + i).toDF("id"), p))
    assert(ManifestTable.tableProperties(spark, p) === Map("k1" -> "a"))
    ManifestTable.setProperties(spark, p, Map("k1" -> "b", "k2" -> "x"))
    assert(ManifestTable.tableProperties(spark, p) ===
      Map("k1" -> "b", "k2" -> "x"))
    // restore to before the second set: properties roll back WITH state
    ManifestTable.restore(spark, p, 2L)
    assert(ManifestTable.tableProperties(spark, p) === Map("k1" -> "a"))
    // restore to v1 (before any set): map empties
    ManifestTable.restore(spark, p, 1L)
    assert(ManifestTable.tableProperties(spark, p) === Map.empty)
    assert(ManifestTable.read(spark, p).count() === 20)
  }

  test("SQL verbs: SET/UNSET/SHOW TBLPROPERTIES + SHOW CREATE TABLE rendering") {
    withSql { s =>
      val p = tmp("graft_props_sql")
      ManifestTable.write(s.range(0, 5).toDF("id"), p)
      s.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
        "('owner' = 'ml-team', 'quality' = 'gold, curated')")
      val shown = s.sql(s"SHOW TBLPROPERTIES '$p'")
        .as[(String, String)].collect().toMap
      assert(shown("owner") === "ml-team")
      assert(shown("quality") === "gold, curated") // comma survives quotes
      assert(shown("graft.minReaderVersion") === "1") // engine keys surface
      s.sql(s"ALTER TABLE '$p' UNSET TBLPROPERTIES IF EXISTS ('quality', 'ghost')")
      val after = s.sql(s"SHOW TBLPROPERTIES '$p'")
        .as[(String, String)].collect().toMap
      assert(after.get("quality").isEmpty && after("owner") === "ml-team")
      val ddl = s.sql(s"SHOW CREATE TABLE '$p'").head().getString(0)
      assert(ddl.contains("'owner' = 'ml-team'"), ddl)
    }
  }

  test("reserved keys route to engine features via SQL (Delta's delta.* idiom)") {
    withSql { s =>
      val p = tmp("graft_props_res")
      ManifestTable.write(s.range(0, 5).toDF("id"), p)
      // protocol route (this library implements (1,1), so the upgrade
      // is a same-version no-op commit — the point is the ROUTING:
      // no error, and nothing lands as a user key)
      s.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
        "('graft.minWriterVersion' = '1')")
      val st = ManifestTable.resolveState(s, p,
        ManifestTable.currentVersion(s, p).get)
      assert(st.minWriter === 1 && st.minReader === 1)
      assert(st.properties.isEmpty, "reserved keys must not land as user keys")
      // row tracking must be declared BEFORE the first write
      // (ManifestTable contract) — fresh path, then ingest
      val p2 = tmp("graft_props_rt")
      s.sql(s"ALTER TABLE '$p2' SET TBLPROPERTIES " +
        "('graft.enableRowTracking' = 'true')")
      ManifestTable.append(s.range(0, 3).toDF("id"), p2)
      val st2 = ManifestTable.resolveState(s, p2,
        ManifestTable.currentVersion(s, p2).get)
      assert(st2.rowTracking)
      // unknown reserved key refused loudly
      val e = intercept[Exception] {
        s.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES ('graft.typo' = '1')")
          .collect()
      }
      assert(e.getMessage.contains("reserved"), e.getMessage)
      // mixed statement: engine + user keys both route
      s.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
        "('graft.minWriterVersion' = '1', 'team' = 'core')")
      assert(ManifestTable.tableProperties(s, p) === Map("team" -> "core"))
    }
  }

  test("properties carry into shallow clones with the state") {
    val p = tmp("graft_props_clone")
    val dst = tmp("graft_props_clone_dst")
    ManifestTable.write(spark.range(0, 8).toDF("id"), p)
    ManifestTable.setProperties(spark, p, Map("origin" -> "sensor-a"))
    ManifestTable.cloneShallow(spark, p, dst, None)
    assert(ManifestTable.tableProperties(spark, dst) ===
      Map("origin" -> "sensor-a"))
  }
}
