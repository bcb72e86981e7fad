package graft

import graft.catalog.GraftCatalog
import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 V2 writer surface: `df.writeTo("graft.db.t")` —
  * append / overwrite(cond) / truncate / V2 CTAS — landing through the
  * SAME ManifestTable commit paths as every other write surface (V1
  * fallback write, `GraftWriteBuilder`), with name READS still
  * resolving to the manifest-governed vectorized scan (the write-target
  * guard in GraftNameResolution must not disturb read-position names).
  */
class WriterV2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouseRoot =
    java.nio.file.Files.createTempDirectory("graft_wv2_wh").toString

  private lazy val sqlSession: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.graft.warehouse", warehouseRoot)
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

  test("writeTo.create (V2 CTAS) then append then read back by name") {
    withSql { s =>
      s.range(0, 40).toDF("id").withColumn("v", col("id") * 3)
        .writeTo("graft.wv2.t1").create()
      assert(s.table("graft.wv2.t1").count() === 40)
      s.range(40, 60).toDF("id").withColumn("v", col("id") * 3)
        .writeTo("graft.wv2.t1").append()
      val got = s.table("graft.wv2.t1").orderBy("id").as[(Long, Long)]
        .collect().toSeq
      assert(got === (0L until 60L).map(i => (i, i * 3)))
      // two commits: atomic staged CTAS (one data write) + append
      val p = GraftCatalog.tablePath(s, "wv2.t1")
      assert(ManifestTable.versions(s, p).size === 2)
    }
  }

  test("writeTo.overwrite(cond) = replaceWhere: untouched files carry byte-identical") {
    withSql { s =>
      // two disjoint key ranges land as separate file sets
      s.range(0, 100).toDF("id")
        .withColumn("grp", when(col("id") < 50, "a").otherwise("b"))
        .withColumn("v", col("id"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id")
        .writeTo("graft.wv2.t2").create()
      val p = GraftCatalog.tablePath(s, "wv2.t2")
      val before = ManifestTable.describeDetail(s, p)
        .select("num_files").head().getLong(0)
      assert(before >= 2)
      val filesBefore = ManifestTable.resolveState(s, p,
        ManifestTable.currentVersion(s, p).get).files.toSet

      // replace only grp='b' rows with re-derived, boosted values
      s.range(50, 100).toDF("id")
        .withColumn("grp", lit("b"))
        .withColumn("v", col("id") + 1000)
        .writeTo("graft.wv2.t2").overwrite(col("grp") === lit("b"))

      val after = s.table("graft.wv2.t2").orderBy("id")
        .as[(Long, String, Long)].collect().toSeq
      val expect = (0L until 50L).map(i => (i, "a", i)) ++
        (50L until 100L).map(i => (i, "b", i + 1000))
      assert(after === expect)
      // files not touched by the predicate carried into the new version
      val filesAfter = ManifestTable.resolveState(s, p,
        ManifestTable.currentVersion(s, p).get).files.toSet
      assert(filesBefore.intersect(filesAfter).nonEmpty,
        "expected untouched files to carry through overwrite(cond)")
    }
  }

  test("writeTo.overwrite(lit(true)) truncates to the new batch") {
    withSql { s =>
      s.range(0, 30).toDF("id").writeTo("graft.wv2.t3").create()
      s.range(100, 110).toDF("id")
        .writeTo("graft.wv2.t3").overwrite(lit(true))
      assert(s.table("graft.wv2.t3").orderBy("id").as[Long]
        .collect().toSeq === (100L until 110L))
    }
  }

  test("V2 CTAS with PARTITIONED BY materializes the declared layout") {
    withSql { s =>
      s.range(0, 20).toDF("id").withColumn("part", col("id") % 2)
        .writeTo("graft.wv2.t4").partitionedBy(col("part")).create()
      val p = GraftCatalog.tablePath(s, "wv2.t4")
      val st = ManifestTable.resolveState(s, p,
        ManifestTable.currentVersion(s, p).get)
      assert(st.files.exists(_.contains("part=")),
        s"expected k=v partition dirs, got ${st.files.take(3)}")
      assert(s.table("graft.wv2.t4").count() === 20)
      // partition pruning works through the name read
      assert(s.table("graft.wv2.t4").filter(col("part") === 1)
        .count() === 10)
    }
  }

  test("SQL INSERT INTO a graft name still routes through the parser verb") {
    withSql { s =>
      s.range(0, 5).toDF("id").writeTo("graft.wv2.t5").create()
      s.sql("INSERT INTO graft.wv2.t5 SELECT id FROM range(5, 9)")
      assert(s.table("graft.wv2.t5").count() === 9)
    }
  }

  test("createOrReplace is history-preserving: the replaced snapshot stays time-travelable") {
    withSql { s =>
      s.range(0, 10).toDF("id").withColumn("tag", lit("old"))
        .writeTo("graft.wv2.t7").createOrReplace()
      val vBefore = ManifestTable.currentVersion(s,
        GraftCatalog.tablePath(s, "wv2.t7")).get
      // replace with a DIFFERENT schema — RTAS commits the new snapshot
      s.range(0, 4).toDF("id").withColumn("score", col("id") * 1.5)
        .writeTo("graft.wv2.t7").replace()
      val p = GraftCatalog.tablePath(s, "wv2.t7")
      assert(s.table("graft.wv2.t7").columns.toSeq === Seq("id", "score"))
      assert(s.table("graft.wv2.t7").count() === 4)
      // history preserved (no drop-and-recreate): old snapshot readable
      val old = ManifestTable.readVersion(s, p, vBefore)
      assert(old.columns.toSeq === Seq("id", "tag") && old.count() === 10)
      // .replace() on a missing table refuses (V2 contract)
      intercept[Exception] {
        s.range(0, 1).toDF("id").writeTo("graft.wv2.ghost").replace()
      }
    }
  }

  test("SQL CREATE OR REPLACE TABLE ... AS SELECT lands through the staging catalog") {
    withSql { s =>
      s.sql("CREATE OR REPLACE TABLE graft.wv2.t8 AS SELECT id FROM range(0, 6)")
      assert(s.table("graft.wv2.t8").count() === 6)
      s.sql("CREATE OR REPLACE TABLE graft.wv2.t8 AS " +
        "SELECT id, id * 2 AS dbl FROM range(0, 3)")
      assert(s.table("graft.wv2.t8").columns.toSeq === Seq("id", "dbl"))
      assert(s.table("graft.wv2.t8").count() === 3)
      // both snapshots live in ONE table history
      val p = GraftCatalog.tablePath(s, "wv2.t8")
      assert(ManifestTable.versions(s, p).size === 2)
    }
  }

  test("TBLPROPERTIES declared at create land as user properties") {
    withSql { s =>
      s.sql("CREATE OR REPLACE TABLE graft.wv2.t9 " +
        "TBLPROPERTIES ('team' = 'core') AS SELECT id FROM range(0, 2)")
      val p = GraftCatalog.tablePath(s, "wv2.t9")
      assert(ManifestTable.tableProperties(s, p) === Map("team" -> "core"))
    }
  }

  test("writes refuse a time-travel view; reads by name stay on the vectorized scan") {
    withSql { s =>
      s.range(0, 10).toDF("id").writeTo("graft.wv2.t6").create()
      s.range(10, 12).toDF("id").writeTo("graft.wv2.t6").append()
      // time travel read still works after the write-capability change
      // (v1 = atomic staged CTAS, v2 = append)
      assert(s.sql("SELECT * FROM graft.wv2.t6 VERSION AS OF 1").count() === 10)
      // the name read compiles to a parquet file scan (no V2 row reader)
      val plan = s.table("graft.wv2.t6").queryExecution.executedPlan.toString
      assert(plan.contains("Scan parquet") || plan.contains("FileScan"),
        s"expected a parquet scan, got:\n$plan")
    }
  }
}
