package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Column DEFAULT values (r14, Delta's defaultValue feature shape):
  * write-time metadata filling columns a write does not supply — SQL
  * `INSERT INTO t (cols)` and MERGE `INSERT (cols) VALUES` — with the
  * usual state lifecycle: validated at declaration, rolls back through
  * RESTORE, rides clones and SHOW CREATE TABLE. Existing rows are
  * never touched (declaration is not a backfill).
  */
class ColumnDefaultsSpec extends SparkSpec {
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

  test("declare + SQL INSERT (cols): absent column fills DEFAULT, no default fills NULL") {
    val path = tmp("graft_def1")
    ManifestTable.write(
      Seq((1L, "a", 10L)).toDF("id", "src", "score"), path)
    ManifestTable.setColumnDefault(spark, path, "score", "42")
    assert(ManifestTable.columnDefaults(spark, path) === Map("score" -> "42"))
    withSql { s =>
      s.sql(s"INSERT INTO '$path' (id, src) VALUES (2, 'b'), (3, 'c')")
      val got = ManifestTable.read(s, path)
        .select("id", "src", "score").as[(Long, String, Option[Long])]
        .collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, "a", Some(10L)), (2L, "b", Some(42L)),
        (3L, "c", Some(42L))))
      // src has no default: leaving it out fills NULL
      s.sql(s"INSERT INTO '$path' (id) VALUES (4)")
      val r4 = ManifestTable.read(s, path).filter(col("id") === 4)
        .select("src", "score").head()
      assert(r4.isNullAt(0) && r4.getLong(1) === 42L)
      // positional resolution: the list order wins over query aliases
      s.sql(s"INSERT INTO '$path' (src, id) SELECT 'z', 9")
      assert(ManifestTable.read(s, path).filter(col("id") === 9)
        .select("src").head().getString(0) === "z")
    }
  }

  test("MERGE INSERT (cols) VALUES: unassigned column takes the DEFAULT (Delta's rule)") {
    val path = tmp("graft_def2")
    ManifestTable.write(Seq((1L, 10L, "x")).toDF("id", "v", "w"), path)
    ManifestTable.setColumnDefault(spark, path, "w", "'defaulted'")
    withSql { s =>
      s.createDataFrame(Seq((1L, 11L), (5L, 50L))).toDF("id", "v")
        .createOrReplaceTempView("def_src")
      s.sql(
        s"""MERGE INTO '$path' USING def_src ON id
            WHEN MATCHED THEN UPDATE SET v = def_src.v
            WHEN NOT MATCHED THEN INSERT (id, v) VALUES (id, v)""")
      val got = ManifestTable.read(s, path)
        .select("id", "v", "w").as[(Long, Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, 11L, "x"), (5L, 50L, "defaulted")),
        "the matched row keeps its value; the inserted row defaults")
    }
  }

  test("validation at declaration: unknown column, column references, uncastable constants all refuse") {
    val path = tmp("graft_def3")
    ManifestTable.write(Seq((1L, 2L)).toDF("id", "v"), path)
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.setColumnDefault(spark, path, "nope", "1")
    }
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.setColumnDefault(spark, path, "v", "id + 1")
    }
    assert(e2.getMessage.contains("constant"), e2.getMessage)
    // constant expressions (not just literals) are fine
    ManifestTable.setColumnDefault(spark, path, "v", "10 * 2 + 2")
    assert(ManifestTable.columnDefaults(spark, path) === Map("v" -> "10 * 2 + 2"))
  }

  test("ALTER COLUMN SET/DROP DEFAULT via SQL; DROP falls back to NULL; SHOW CREATE renders it") {
    val path = tmp("graft_def4")
    ManifestTable.write(Seq((1L, 5L)).toDF("id", "n"), path)
    withSql { s =>
      s.sql(s"ALTER TABLE '$path' ALTER COLUMN n SET DEFAULT 7")
      s.sql(s"INSERT INTO '$path' (id) VALUES (2)")
      assert(ManifestTable.read(s, path).filter(col("id") === 2)
        .select("n").head().getLong(0) === 7L)
      val ddl = s.sql(s"SHOW CREATE TABLE '$path'").head().getString(0)
      assert(ddl.contains("DEFAULT (7)"), ddl)
      s.sql(s"ALTER TABLE '$path' ALTER COLUMN n DROP DEFAULT")
      s.sql(s"INSERT INTO '$path' (id) VALUES (3)")
      assert(ManifestTable.read(s, path).filter(col("id") === 3)
        .select("n").head().isNullAt(0))
    }
  }

  test("UPDATE SET c = DEFAULT: declared constant where present, NULL otherwise (r14)") {
    val path = tmp("graft_def6")
    ManifestTable.write(
      Seq((1L, 5L, "x"), (2L, 6L, "y")).toDF("id", "n", "s"), path)
    ManifestTable.setColumnDefault(spark, path, "n", "77")
    withSql { s =>
      s.sql(s"UPDATE '$path' SET n = DEFAULT WHERE id = 1")
      assert(ManifestTable.read(s, path).filter(col("id") === 1)
        .select("n").head().getLong(0) === 77L)
      // no default declared on s: the keyword falls back to NULL
      s.sql(s"UPDATE '$path' SET s = DEFAULT WHERE id = 2")
      assert(ManifestTable.read(s, path).filter(col("id") === 2)
        .select("s").head().isNullAt(0))
      // a column literally assigned the STRING 'DEFAULT' is data
      s.sql(s"UPDATE '$path' SET s = 'DEFAULT' WHERE id = 1")
      assert(ManifestTable.read(s, path).filter(col("id") === 1)
        .select("s").head().getString(0) === "DEFAULT")
    }
  }

  test("inline DEFAULT in CREATE TABLE column DDL, either suffix order with NOT NULL") {
    withSql { s =>
      val root = java.nio.file.Files.createTempDirectory("graft_def_ddl")
      // the warehouse conf is session-shared: pin, then ALWAYS restore
      val prevWh = s.conf.getOption("spark.graft.warehouse")
      s.conf.set("spark.graft.warehouse", root.toString)
      try {
        val p = s"$root/defdb/t"
        s.sql("CREATE TABLE graft.defdb.t (id BIGINT NOT NULL, " +
          "n BIGINT DEFAULT 7 NOT NULL, tag STRING DEFAULT 'untagged')")
        assert(ManifestTable.columnDefaults(s, p) ===
          Map("n" -> "7", "tag" -> "'untagged'"))
        s.sql(s"INSERT INTO '$p' (id) VALUES (1)")
        val r = ManifestTable.read(s, p).select("id", "n", "tag").head()
        assert(r.getLong(0) === 1L && r.getLong(1) === 7L &&
          r.getString(2) === "untagged")
        // NOT NULL invariants still declared on both spellings
        val e = intercept[Exception] {
          ManifestTable.append(
            spark.sql(
              "SELECT CAST(NULL AS BIGINT) AS id, 1L AS n, 'x' AS tag"),
            p)
        }
        assert(e.getMessage.toLowerCase.contains("null"), e.getMessage)
      } finally prevWh match {
        case Some(w) => s.conf.set("spark.graft.warehouse", w)
        case None    => s.conf.unset("spark.graft.warehouse")
      }
    }
  }

  test("declaration survives checkpoint-ONLY resolution (manifests below the checkpoint removed)") {
    val path = tmp("graft_def_cp")
    ManifestTable.write(Seq((1L, 2L)).toDF("id", "n"), path)
    ManifestTable.setColumnDefault(spark, path, "n", "9")
    // cross the 16-commit checkpoint boundary
    (0 until 17).foreach(i =>
      ManifestTable.append(Seq((100L + i, 1L)).toDF("id", "n"), path))
    val dir = new java.io.File(path)
    val cpVs = dir.listFiles()
      .map(_.getName).filter(_.startsWith("_graft_checkpoint-v"))
      .map(_.stripPrefix("_graft_checkpoint-v").stripSuffix(".json").toLong)
    assert(cpVs.nonEmpty, "a checkpoint must exist after 18 commits")
    val cp = cpVs.max
    // remove every manifest at or below the checkpoint: the defaults
    // map must come from the checkpoint's own serialization
    dir.listFiles().filter { f =>
      f.getName.startsWith("_graft_manifest-v") &&
        f.getName.stripPrefix("_graft_manifest-v")
          .stripSuffix(".json").toLong <= cp
    }.foreach(f => assert(f.delete()))
    // copy to a FRESH path so the in-JVM state cache cannot answer —
    // resolution must parse the checkpoint's own serialization
    val path2 = tmp("graft_def_cp2")
    def cp0(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(f =>
          cp0(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath): Unit
    }
    new java.io.File(path2).delete()
    cp0(dir, new java.io.File(path2))
    assert(ManifestTable.columnDefaults(spark, path2) === Map("n" -> "9"))
    withSql { s =>
      s.sql(s"INSERT INTO '$path2' (id) VALUES (999)")
      assert(ManifestTable.read(s, path2).filter(col("id") === 999)
        .select("n").head().getLong(0) === 9L)
    }
  }

  test("rename migrates the declaration; drop kills it — no resurrection on re-add (r14 review)") {
    val path = tmp("graft_def_mv")
    ManifestTable.write(Seq((1L, 5L)).toDF("id", "n"), path)
    ManifestTable.setColumnDefault(spark, path, "n", "7")
    ManifestTable.renameColumn(spark, path, "n", "m")
    assert(ManifestTable.columnDefaults(spark, path) === Map("m" -> "7"),
      "the DEFAULT follows its column through RENAME")
    withSql { s =>
      s.sql(s"INSERT INTO '$path' (id) VALUES (2)")
      assert(ManifestTable.read(s, path).filter(col("id") === 2)
        .select("m").head().getLong(0) === 7L)
    }
    ManifestTable.dropColumn(spark, path, "m")
    assert(ManifestTable.columnDefaults(spark, path) === Map.empty,
      "the DEFAULT dies with its column")
    ManifestTable.addColumns(spark, path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m",
          org.apache.spark.sql.types.LongType))))
    withSql { s =>
      s.sql(s"INSERT INTO '$path' (id) VALUES (3)")
      assert(ManifestTable.read(s, path).filter(col("id") === 3)
        .select("m").head().isNullAt(0),
        "a re-added same-name column must NOT resurrect the stale default")
    }
  }

  test("case-insensitive resolution: INSERT column list and SET DEFAULT accept any identifier case (r14 review)") {
    val path = tmp("graft_def_ci")
    ManifestTable.write(Seq((1L, 5L, "x")).toDF("id", "n", "s"), path)
    ManifestTable.setColumnDefault(spark, path, "n", "7")
    withSql { sx =>
      sx.sql(s"INSERT INTO '$path' (ID, S) VALUES (2, 'y')")
      val r = ManifestTable.read(sx, path).filter(col("id") === 2)
        .select("n", "s").head()
      assert(r.getLong(0) === 7L && r.getString(1) === "y")
      sx.sql(s"UPDATE '$path' SET N = DEFAULT WHERE id = 1")
      assert(ManifestTable.read(sx, path).filter(col("id") === 1)
        .select("n").head().getLong(0) === 7L)
    }
  }

  test("a bad inline DEFAULT refuses BEFORE the empty-schema commit publishes (r14 review)") {
    withSql { s =>
      val root = java.nio.file.Files.createTempDirectory("graft_def_bad")
      val prevWh = s.conf.getOption("spark.graft.warehouse")
      s.conf.set("spark.graft.warehouse", root.toString)
      try {
        val e = intercept[Exception] {
          s.sql("CREATE TABLE graft.baddef.t " +
            "(a BIGINT, b BIGINT DEFAULT some_col)")
        }
        assert(e.getMessage.contains("constant"), e.getMessage)
        assert(!new java.io.File(s"$root/baddef/t").exists,
          "no half-created table")
      } finally prevWh match {
        case Some(w) => s.conf.set("spark.graft.warehouse", w)
        case None    => s.conf.unset("spark.graft.warehouse")
      }
    }
  }

  test("lifecycle: RESTORE rolls the declaration back; clones carry it") {
    val path = tmp("graft_def5")
    ManifestTable.write(Seq((1L, 5L)).toDF("id", "n"), path)
    val beforeDecl = ManifestTable.currentVersion(spark, path).get
    ManifestTable.setColumnDefault(spark, path, "n", "99")
    // clone AFTER the declaration: both clone flavors carry it
    val root = java.nio.file.Files.createTempDirectory("graft_def5c").toString
    ManifestTable.cloneShallow(spark, path, s"$root/sh")
    ManifestTable.cloneDeep(spark, path, s"$root/dp")
    assert(ManifestTable.columnDefaults(spark, s"$root/sh") === Map("n" -> "99"))
    assert(ManifestTable.columnDefaults(spark, s"$root/dp") === Map("n" -> "99"))
    // restore to before the declaration: the default is gone
    ManifestTable.restore(spark, path, beforeDecl)
    assert(ManifestTable.columnDefaults(spark, path) === Map.empty)
  }

  test("non-deterministic defaults are refused at declaration (rand, uuid)") {
    val path = tmp("graft_def6")
    ManifestTable.write(Seq((1L, 5L)).toDF("id", "n"), path)
    // rand()/uuid() evaluate fine against a row-less probe but would
    // yield a different value per inserted row/statement — Delta/Spark
    // require constant-foldable defaults, so declaration refuses
    Seq("rand()", "uuid()", "cast(rand() * 100 as bigint)").foreach { e =>
      val ex = intercept[IllegalArgumentException] {
        ManifestTable.setColumnDefault(spark, path, "n", e)
      }
      assert(ex.getMessage.contains("deterministic"), s"$e: ${ex.getMessage}")
    }
    // deterministic expressions (even non-literal ones) still pass
    ManifestTable.setColumnDefault(spark, path, "n", "abs(-7) + 1")
    assert(ManifestTable.columnDefaults(spark, path) === Map("n" -> "abs(-7) + 1"))
  }

  test("ALTER COLUMN SET/DROP DEFAULT resolves the column case-insensitively") {
    val path = tmp("graft_def7")
    ManifestTable.write(Seq((1L, 5L)).toDF("id", "myScore"), path)
    // declared with different casing: canonicalized to the schema's
    // spelling, so the INSERT consumer (case-insensitive) finds it
    ManifestTable.setColumnDefault(spark, path, "MYSCORE", "42")
    assert(ManifestTable.columnDefaults(spark, path) === Map("myScore" -> "42"))
    withSql { s =>
      s.sql(s"INSERT INTO '$path' (id) VALUES (2)")
      val got = ManifestTable.read(s, path).filter(col("id") === 2)
        .select("myScore").as[Option[Long]].head()
      assert(got === Some(42L))
    }
    // dropped with yet another casing
    ManifestTable.dropColumnDefault(spark, path, "myscore")
    assert(ManifestTable.columnDefaults(spark, path) === Map.empty)
    // unknown column still refuses loudly
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.setColumnDefault(spark, path, "nope", "1")
    }
    assert(ex.getMessage.contains("unknown column"), ex.getMessage)
  }

  test("ADD COLUMNS: a column literally named `default` is not spuriously refused") {
    val path = tmp("graft_def8")
    ManifestTable.write(Seq((1L, 5L)).toDF("id", "n"), path)
    withSql { s =>
      // a column NAMED default, and a COMMENT containing the word,
      // must both pass — only the DEFAULT CLAUSE is refused
      s.sql(s"ALTER TABLE '$path' ADD COLUMNS (`default` BIGINT)")
      s.sql(s"ALTER TABLE '$path' ADD COLUMNS " +
        "(note STRING COMMENT 'falls back to DEFAULT behavior')")
      val names = ManifestTable.read(s, path).schema.fieldNames.toSeq
      assert(names.contains("default") && names.contains("note"), names)
      // the real clause still refuses with the honest two-step
      val ex = intercept[Exception] {
        s.sql(s"ALTER TABLE '$path' ADD COLUMNS (extra BIGINT DEFAULT 7)")
      }
      assert(ex.getMessage.contains("SET DEFAULT"), ex.getMessage)
    }
  }
}
