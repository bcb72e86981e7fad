package graft

import graft.catalog.GraftCatalog
import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 catalog surface: NAME-based tables over ManifestTable —
  * `spark.table("graft.db.t")`, `FROM graft.db.t`, and every ACID verb
  * on catalog names, resolving to the same manifest-governed plans as
  * the path API (the platform surface the reference wires via its
  * Delta catalog, `/root/reference/src/etl_pipeline.py:36-37`).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouseRoot =
    java.nio.file.Files.createTempDirectory("graft_cat_wh").toString

  /** One extended session on the shared context with the warehouse
    * pinned (extensions bind at session creation). */
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

  test("name resolution: spark.table and FROM graft.db.t reach the manifest scan") {
    withSql { s =>
      GraftCatalog.saveAsTable(
        s.range(0, 50).toDF("id").withColumn("v", col("id") * 2),
        "res.t1")
      // DataFrame API by name
      assert(s.table("graft.res.t1").count() === 50)
      // SQL relation by name (3-part and the 2-part default-db form)
      assert(s.sql("SELECT count(*) AS n FROM graft.res.t1")
        .head().getLong(0) === 50)
      GraftCatalog.saveAsTable(s.range(0, 7).toDF("id"), "t_default")
      assert(s.sql("SELECT * FROM graft.t_default").count() === 7)
      assert(s.table("graft.t_default").count() === 7)
      // joins over two name relations compose
      GraftCatalog.saveAsTable(
        s.range(0, 10).toDF("id").withColumn("lbl", concat(lit("x"), col("id"))),
        "res.t2")
      val j = s.sql(
        """SELECT a.id, b.lbl FROM graft.res.t1 a
           JOIN graft.res.t2 b ON a.id = b.id""")
      assert(j.count() === 10)
      // an unknown graft name raises the standard not-found analysis error
      intercept[Exception] { s.sql("SELECT * FROM graft.res.nope").collect() }
    }
  }

  test("catalog verbs by name: CTAS, INSERT, MERGE, UPDATE, OPTIMIZE, DESCRIBE HISTORY, SHOW TABLES, DROP") {
    withSql { s =>
      // CTAS by name — the managed location materializes by convention
      s.sql("CREATE TABLE graft.verbs.orders AS " +
        "SELECT id AS o_id, CAST(id * 10 AS BIGINT) AS amount " +
        "FROM range(100)")
      assert(new java.io.File(s"$warehouseRoot/verbs/orders").isDirectory)
      assert(s.table("graft.verbs.orders").count() === 100)
      // INSERT INTO by name, reading another NAME in the inner query
      s.sql("INSERT INTO graft.verbs.orders " +
        "SELECT o_id + 1000 AS o_id, amount FROM graft.verbs.orders " +
        "WHERE o_id < 5")
      assert(s.table("graft.verbs.orders").count() === 105)
      // UPDATE by name
      s.sql("UPDATE graft.verbs.orders SET amount = 0 WHERE o_id = 7")
      assert(s.sql(
        "SELECT amount FROM graft.verbs.orders WHERE o_id = 7")
        .head().getLong(0) === 0L)
      // MERGE INTO by name
      s.createDataFrame(Seq((1L, 111L), (2000L, 5L)))
        .toDF("o_id", "amount").createOrReplaceTempView("m_src")
      s.sql(
        """MERGE INTO graft.verbs.orders USING m_src ON o_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
      val got = s.table("graft.verbs.orders")
        .filter(col("o_id").isin(1L, 2000L))
        .select("o_id", "amount").as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 111L, 2000L -> 5L))
      // OPTIMIZE + DESCRIBE HISTORY by name
      s.sql("OPTIMIZE graft.verbs.orders INTO 1 FILES")
      val ops = s.sql("DESCRIBE HISTORY graft.verbs.orders")
        .select("operation").as[String].collect().toSeq
      assert(ops.contains("MERGE") && ops.contains("UPDATE"))
      // SHOW TABLES lists it; DROP removes the managed dir
      val listed = s.sql("SHOW TABLES IN graft.verbs")
        .select("table").as[String].collect().toSeq
      assert(listed === Seq("orders"))
      s.sql("DROP TABLE graft.verbs.orders")
      assert(!new java.io.File(s"$warehouseRoot/verbs/orders").exists)
      assert(s.sql("SHOW TABLES IN graft.verbs").collect().isEmpty)
    }
  }

  test("external tables: CREATE TABLE ... LOCATION adopts a path; DROP unregisters without deleting") {
    val ext = java.nio.file.Files.createTempDirectory("graft_cat_ext")
      .toString + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), ext)
    withSql { s =>
      s.sql(s"CREATE TABLE graft.ext.adopted LOCATION '$ext'")
      assert(s.table("graft.ext.adopted").count() === 2)
      assert(GraftCatalog.listTables(s, "ext") ===
        Seq("adopted" -> ext))
      // the name and the path address the SAME table
      s.sql("INSERT INTO graft.ext.adopted SELECT 3 AS id, 'c' AS v")
      assert(ManifestTable.read(s, ext).count() === 3)
      // registering over an existing name is refused
      intercept[IllegalArgumentException] {
        GraftCatalog.registerExternal(s, "ext.adopted", ext)
      }
      // DROP unregisters but leaves external data
      s.sql("DROP TABLE graft.ext.adopted")
      assert(GraftCatalog.listTables(s, "ext").isEmpty)
      assert(ManifestTable.read(s, ext).count() === 3,
        "external data must survive a non-purge drop")
    }
  }

  test("DROP TABLE ... PURGE deletes external data (r13: verb reachable on bare names)") {
    val ext = java.nio.file.Files.createTempDirectory("graft_cat_prg")
      .toString + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), ext)
    withSql { s =>
      s.sql(s"CREATE TABLE graft.prg.victim LOCATION '$ext'")
      assert(s.table("graft.prg.victim").count() === 1)
      s.sql("DROP TABLE graft.prg.victim PURGE")
      assert(GraftCatalog.listTables(s, "prg").isEmpty)
      assert(!new java.io.File(ext).exists,
        "PURGE must delete the external data directory")
    }
  }

  test("empty-table DDL lifecycle: declare schema -> constraint -> ingest -> rename -> read by new name (r13)") {
    withSql { s =>
      import s.implicits._
      s.sql("CREATE TABLE graft.ddl.orders_decl " +
        "(o_id BIGINT NOT NULL, o_amt DOUBLE, o_day STRING)")
      // declared empty: readable, zero rows, schema committed
      val empty = s.table("graft.ddl.orders_decl")
      assert(empty.count() === 0)
      assert(empty.schema.fieldNames.toSeq === Seq("o_id", "o_amt", "o_day"))
      assert(ManifestTable.notNullColumns(s,
        s"$warehouseRoot/ddl/orders_decl") === Seq("o_id"))
      // constraint BEFORE any data
      s.sql("ALTER TABLE graft.ddl.orders_decl " +
        "ADD CONSTRAINT amt_pos CHECK (o_amt > 0)")
      // ingest respects both the invariant and the constraint
      s.sql("INSERT INTO graft.ddl.orders_decl " +
        "SELECT 1L AS o_id, CAST(10.0 AS DOUBLE) AS o_amt, 'd1' AS o_day")
      intercept[Exception] {
        s.sql("INSERT INTO graft.ddl.orders_decl " +
          "SELECT 2L AS o_id, CAST(-5.0 AS DOUBLE) AS o_amt, 'd1' AS o_day")
      }
      intercept[Exception] {
        s.sql("INSERT INTO graft.ddl.orders_decl " +
          "SELECT CAST(NULL AS BIGINT) AS o_id, " +
          "CAST(5.0 AS DOUBLE) AS o_amt, 'd1' AS o_day")
      }
      assert(s.table("graft.ddl.orders_decl").count() === 1)
      // rename (same db), read by the NEW name, old name gone
      s.sql("ALTER TABLE graft.ddl.orders_decl RENAME TO graft.ddl.orders_live")
      assert(s.table("graft.ddl.orders_live")
        .select("o_id").as[Long].head() === 1L)
      assert(!new java.io.File(s"$warehouseRoot/ddl/orders_decl").exists)
      intercept[Exception] { s.table("graft.ddl.orders_decl").count() }
      // cross-database rename moves the directory
      s.sql("ALTER TABLE graft.ddl.orders_live RENAME TO graft.ddl2.orders_live")
      assert(s.table("graft.ddl2.orders_live").count() === 1)
      // PARTITIONED BY declaration is validated against the schema,
      // recorded in the manifest, and INHERITED by the first data
      // overwrite (which names no layout of its own)
      s.sql("CREATE TABLE graft.ddl.part_decl (id BIGINT, y INT) " +
        "PARTITIONED BY (y)")
      assert(s.table("graft.ddl.part_decl").count() === 0)
      assert(ManifestTable.describeDetail(s,
          s"$warehouseRoot/ddl/part_decl")
        .select("partition_columns").head().getString(0) === "y",
        "declared partitioning must survive the empty commit")
      s.sql("INSERT OVERWRITE graft.ddl.part_decl " +
        "SELECT id, CAST(id % 2 AS INT) AS y FROM RANGE(10)")
      val partDirs = new java.io.File(s"$warehouseRoot/ddl/part_decl")
        .listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("y="))
      assert(partDirs.toSet === Set("y=0", "y=1"),
        s"first overwrite must inherit the declared k=v layout: ${partDirs.toSeq}")
      assert(s.table("graft.ddl.part_decl").count() === 10)
      intercept[Exception] {
        s.sql("CREATE TABLE graft.ddl.bad_part (id BIGINT) " +
          "PARTITIONED BY (nope)")
      }
      // external rename: registry re-point, data never moves
      val ext = java.nio.file.Files.createTempDirectory("graft_cat_rn")
        .toString + "/t"
      ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), ext)
      s.sql(s"CREATE TABLE graft.ddl.ext_old LOCATION '$ext'")
      s.sql("ALTER TABLE graft.ddl.ext_old RENAME TO graft.ddl.ext_new")
      assert(s.table("graft.ddl.ext_new").count() === 1)
      assert(GraftCatalog.externals(s, "ddl").get("ext_new") === Some(ext))
      assert(!GraftCatalog.externals(s, "ddl").contains("ext_old"))
    }
  }

  test("DESCRIBE EXTENDED / SHOW CREATE TABLE are deterministic and carry the declared surface (r13)") {
    withSql { s =>
      import s.implicits._
      s.sql("CREATE TABLE graft.intro.t " +
        "(id BIGINT NOT NULL, amt DECIMAL(10,2), day STRING) " +
        "PARTITIONED BY (day)")
      s.sql("ALTER TABLE graft.intro.t ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      s.sql("ALTER TABLE graft.intro.t ADD IDENTITY COLUMN id START WITH 10")
      val ddl = s.sql("SHOW CREATE TABLE graft.intro.t")
        .as[String].head()
      assert(ddl.contains("CREATE TABLE graft.intro.t"), ddl)
      assert(ddl.contains("id BIGINT GENERATED BY DEFAULT AS IDENTITY NOT NULL"), ddl)
      assert(ddl.contains("amt DECIMAL(10,2)"), ddl)
      assert(ddl.contains("USING graft"), ddl)
      assert(ddl.contains("'graft.constraints.amt_pos' = 'amt > 0'"), ddl)
      assert(!ddl.toLowerCase.contains("location"),
        s"managed table must not render LOCATION: $ddl")
      // twice -> byte-identical (determinism)
      assert(s.sql("SHOW CREATE TABLE graft.intro.t").as[String].head() === ddl)
      val desc = s.sql("DESCRIBE EXTENDED graft.intro.t").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(desc.take(3).toSeq === Seq(
        ("id", "bigint", "not null; identity(step=1)"),
        ("amt", "decimal(10,2)", ""),
        ("day", "string", "")), desc.toSeq)
      val info = desc.dropWhile(_._1 != "# Detailed Table Information")
        .map { case (k, v, _) => k -> v }.toMap
      assert(info("Name") === "graft.intro.t")
      assert(info("Type") === "MANAGED")
      assert(info("Provider") === "graft")
      assert(info("Partition Columns") === "day")
      assert(info("Constraints") === "amt_pos CHECK (amt > 0)")
      assert(info("Protocol") === "minReader=1 minWriter=1")
      // no timestamp field anywhere in the section
      assert(!info.keys.exists(_.toLowerCase.contains("time")), info)
    }
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF on catalog names (r13)") {
    withSql { s =>
      import s.implicits._
      GraftCatalog.saveAsTable(Seq((1L, "a")).toDF("id", "v"), "ttsql.t")
      val t1 = System.currentTimeMillis()
      Thread.sleep(20)
      GraftCatalog.saveAsTable(Seq((2L, "b")).toDF("id", "v"), "ttsql.t",
        mode = "append")
      assert(s.sql("SELECT * FROM graft.ttsql.t").count() === 2)
      assert(s.sql("SELECT * FROM graft.ttsql.t VERSION AS OF 1")
        .count() === 1)
      val atT1 = s.sql(
        s"SELECT * FROM graft.ttsql.t TIMESTAMP AS OF " +
          s"'${new java.sql.Timestamp(t1)}'")
      assert(atT1.select("id").as[Long].collect().toSeq === Seq(1L),
        "timestamp travel on a name must pin the first commit")
      // travel across schema evolution keeps the OLD schema
      GraftCatalog.saveAsTable(
        Seq((3L, "c", 9L)).toDF("id", "v", "extra"), "ttsql.t",
        mode = "append")
      assert(s.sql("SELECT * FROM graft.ttsql.t VERSION AS OF 2")
        .schema.fieldNames.toSeq === Seq("id", "v"))
      assert(s.sql("SELECT * FROM graft.ttsql.t").schema.fieldNames.toSeq
        === Seq("id", "v", "extra"))
    }
  }

  test("dropNamespace: non-empty refused without CASCADE; CASCADE deletes the dir and breaks same-warehouse clones (pinned hazard, r13)") {
    withSql { s =>
      GraftCatalog.saveAsTable(s.range(0, 3).toDF("id"), "dropns.t1")
      // a same-warehouse shallow clone in ANOTHER namespace references
      // files under dropns — the documented cascade-drop hazard
      val cloneDst = s"$warehouseRoot/keepns/c1"
      ManifestTable.cloneShallow(s, s"$warehouseRoot/dropns/t1", cloneDst)
      assert(s.table("graft.keepns.c1").count() === 3)
      // non-empty namespace without CASCADE is refused
      intercept[Exception] { s.sql("DROP NAMESPACE graft.dropns") }
      assert(new java.io.File(s"$warehouseRoot/dropns").isDirectory)
      s.sql("DROP NAMESPACE graft.dropns CASCADE")
      assert(!new java.io.File(s"$warehouseRoot/dropns").exists)
      // pinned: the clone's external refs now dangle (external clones
      // survive a source drop; SAME-WAREHOUSE clones do not — audit
      // clones before a cascade drop, as before VACUUM)
      intercept[Exception] {
        ManifestTable.read(s, cloneDst).count()
      }
    }
  }

  test("read-option time travel on names: versionAsOf / timestampAsOf (r12)") {
    withSql { s =>
      GraftCatalog.saveAsTable(s.range(0, 6).toDF("id"), "ttro.t")
      val t1 = System.currentTimeMillis()
      Thread.sleep(20)
      GraftCatalog.saveAsTable(s.range(6, 10).toDF("id"), "ttro.t",
        mode = "append")
      assert(s.table("graft.ttro.t").count() === 10)
      assert(s.read.option("versionAsOf", 1)
        .table("graft.ttro.t").count() === 6)
      // Spark's own option validation requires a CASTABLE timestamp
      // string (epoch millis are rejected before any rule runs)
      val tsStr = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
        .format(new java.util.Date(t1))
      assert(s.read.option("timestampAsOf", tsStr)
        .table("graft.ttro.t").count() === 6)
    }
  }

  test("time travel and CDF by name through the TVFs; path verbs unchanged") {
    withSql { s =>
      GraftCatalog.saveAsTable(s.range(0, 10).toDF("id"), "tt.t")
      GraftCatalog.saveAsTable(s.range(10, 15).toDF("id"), "tt.t",
        mode = "append")
      assert(s.sql("SELECT * FROM graft_table('graft:tt.t', 1)")
        .count() === 10)
      assert(s.sql("SELECT * FROM graft_table('graft:tt.t')")
        .count() === 15)
      val ch = s.sql(
        "SELECT * FROM graft_table_changes('graft:tt.t', 2)")
      assert(ch.count() === 5)
      // plain path spelling still works end to end
      val p = java.nio.file.Files.createTempDirectory("graft_cat_p")
        .toString + "/t"
      ManifestTable.write(Seq((1L, 2L)).toDF("a", "b"), p)
      assert(s.sql(s"SELECT * FROM graft.'$p'").count() === 1)
    }
  }

  test("CTAS TBLPROPERTIES: reserved graft.* keys route to engine features; a bad key fails BEFORE anything commits (r14)") {
    withSql { s =>
      // minWriterVersion=1 is the library's own ceiling — the point
      // here is the ROUTING: the reserved key reaches the protocol
      // path and never lands in the user map
      s.sql("CREATE TABLE graft.props.t1 " +
        "TBLPROPERTIES ('team'='core', 'graft.minWriterVersion'='1') " +
        "AS SELECT id FROM range(10)")
      val p1 = s"$warehouseRoot/props/t1"
      assert(ManifestTable.tableProperties(s, p1) === Map("team" -> "core"),
        "reserved keys route to the protocol, never into the user map")
      val st = ManifestTable.resolveState(s, p1,
        ManifestTable.currentVersion(s, p1).get)
      assert(st.minWriter === 1)
      assert(s.table("graft.props.t1").count() === 10)
      // a version the library cannot implement is refused up front
      val e0 = intercept[Exception] {
        s.sql("CREATE TABLE graft.props.badv " +
          "TBLPROPERTIES ('graft.minWriterVersion'='9') " +
          "AS SELECT id FROM range(5)")
      }
      assert(e0.getMessage.contains("protocol"), e0.getMessage)
      assert(!new java.io.File(s"$warehouseRoot/props/badv").exists,
        "ceiling validates at DDL time, before any commit")

      // unknown reserved key: refused at DDL time, NOTHING published
      val e = intercept[Exception] {
        s.sql("CREATE TABLE graft.props.bad " +
          "TBLPROPERTIES ('graft.enableTeleport'='true') " +
          "AS SELECT id FROM range(5)")
      }
      assert(e.getMessage.contains("unknown reserved property"),
        e.getMessage)
      assert(!new java.io.File(s"$warehouseRoot/props/bad").exists,
        "validation precedes every commit — no half-applied CTAS")

      // row tracking needs an EMPTY table — CTAS/RTAS refuse with the
      // workable recipe, again before anything runs
      val e2 = intercept[Exception] {
        s.sql("CREATE TABLE graft.props.bad2 " +
          "TBLPROPERTIES ('graft.enableRowTracking'='true') " +
          "AS SELECT id FROM range(5)")
      }
      assert(e2.getMessage.contains("EMPTY table"), e2.getMessage)
      assert(!new java.io.File(s"$warehouseRoot/props/bad2").exists)

      // ...while plain empty-table DDL declares it happily
      s.sql("CREATE TABLE graft.props.decl (id BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.enableRowTracking'='true', 'owner.team'='ml')")
      val pd = s"$warehouseRoot/props/decl"
      val std = ManifestTable.resolveState(s, pd,
        ManifestTable.currentVersion(s, pd).get)
      assert(std.rowTracking, "reserved key routed on empty-table DDL")
      assert(ManifestTable.tableProperties(s, pd) === Map("owner.team" -> "ml"))
    }
  }

  test("REPLACE resets TBLPROPERTIES to the declared set — stale keys from the replaced table drop (r14)") {
    withSql { s =>
      s.sql("CREATE TABLE graft.props.r " +
        "TBLPROPERTIES ('stale'='x', 'team'='core') " +
        "AS SELECT id FROM range(8)")
      val p = s"$warehouseRoot/props/r"
      assert(ManifestTable.tableProperties(s, p) ===
        Map("stale" -> "x", "team" -> "core"))
      s.sql("CREATE OR REPLACE TABLE graft.props.r " +
        "TBLPROPERTIES ('team'='ml') " +
        "AS SELECT id, id * 2 AS v FROM range(3)")
      assert(ManifestTable.tableProperties(s, p) === Map("team" -> "ml"),
        "REPLACE publishes the declared map WHOLESALE — no stale merge")
      assert(s.table("graft.props.r").count() === 3)
      // history-preserving: the replaced snapshot stays travelable
      assert(s.sql("SELECT * FROM graft.props.r VERSION AS OF 1")
        .count() === 8)
      // replace with NO declared properties clears the map
      s.sql("CREATE OR REPLACE TABLE graft.props.r AS SELECT id FROM range(2)")
      assert(ManifestTable.tableProperties(s, p) === Map.empty)
    }
  }

  test("V2 alterTable: the programmatic TableCatalog path routes to the same engine verbs (r14)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    import org.apache.spark.sql.types.LongType
    withSql { s =>
      s.sql("CREATE TABLE graft.altv2.t AS SELECT id, id * 2 AS v FROM range(10)")
      val p = s"$warehouseRoot/altv2/t"
      val cat = new graft.catalog.GraftCatalogPlugin()
      cat.initialize("graft",
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap()))
      val ident = Identifier.of(Array("altv2"), "t")
      // property set/remove route exactly like SET/UNSET TBLPROPERTIES
      cat.alterTable(ident, TableChange.setProperty("team", "core"))
      assert(ManifestTable.tableProperties(s, p) === Map("team" -> "core"))
      cat.alterTable(ident, TableChange.removeProperty("team"))
      assert(ManifestTable.tableProperties(s, p) === Map.empty)
      // add a nullable column; existing rows read NULL
      cat.alterTable(ident,
        TableChange.addColumn(Array("extra"), LongType, true))
      assert(s.table("graft.altv2.t").columns.toSeq ===
        Seq("id", "v", "extra"))
      assert(s.table("graft.altv2.t").filter("extra IS NULL").count() === 10)
      // non-nullable add refuses with the workable recipe
      val e = intercept[IllegalArgumentException] {
        cat.alterTable(ident,
          TableChange.addColumn(Array("strict"), LongType, false))
      }
      assert(e.getMessage.contains("non-nullable"), e.getMessage)
      // rename + drop route to the column-mapping verbs
      cat.alterTable(ident, TableChange.renameColumn(Array("v"), "val"))
      assert(s.table("graft.altv2.t").columns.toSeq ===
        Seq("id", "val", "extra"))
      cat.alterTable(ident, TableChange.deleteColumn(Array("extra"), false))
      assert(s.table("graft.altv2.t").columns.toSeq === Seq("id", "val"))
      // unknown change classes refuse loudly
      val e2 = intercept[UnsupportedOperationException] {
        cat.alterTable(ident,
          TableChange.updateColumnType(Array("val"), LongType))
      }
      assert(e2.getMessage.contains("not supported"), e2.getMessage)
    }
  }

  test("CREATE TABLE LIKE: empty table with the source's declared surface, no data (r14)") {
    withSql { s =>
      s.sql("CREATE TABLE graft.like_src.t " +
        "TBLPROPERTIES ('team'='core') " +
        "AS SELECT id, CAST(id * 2 AS BIGINT) AS v, " +
        "CONCAT('p', CAST(id % 3 AS STRING)) AS part FROM range(30)")
      val sp = s"$warehouseRoot/like_src/t"
      ManifestTable.addCheckConstraint(s, sp, "v_ok", "v >= 0")
      ManifestTable.setColumnDefault(s, sp, "v", "42")
      // by NAME
      s.sql("CREATE TABLE graft.like_dst.t LIKE graft.like_src.t")
      val dp = s"$warehouseRoot/like_dst/t"
      assert(s.table("graft.like_dst.t").count() === 0, "shape, not data")
      assert(s.table("graft.like_dst.t").columns.toSeq ===
        Seq("id", "v", "part"))
      assert(ManifestTable.tableProperties(s, dp) === Map("team" -> "core"))
      assert(ManifestTable.columnDefaults(s, dp) === Map("v" -> "42"))
      s.sql(s"INSERT INTO '$dp' (id, part) VALUES (7, 'p1')")
      val r = ManifestTable.read(s, dp).select("id", "v", "part").head()
      assert(r.getLong(0) === 7L && r.getLong(1) === 42L)
      val e = intercept[Exception] {
        ManifestTable.append(
          s.sql("SELECT 1L AS id, CAST(-5 AS BIGINT) AS v, 'p0' AS part"),
          dp)
      }
      assert(e.getMessage.contains("v_ok"), "constraints carried")
      // by PATH target
      val root2 = java.nio.file.Files.createTempDirectory("graft_like_p")
      s.sql(s"CREATE TABLE '$root2/t2' LIKE graft.like_src.t")
      assert(ManifestTable.read(s, s"$root2/t2").count() === 0)
      assert(ManifestTable.columnDefaults(s, s"$root2/t2") ===
        Map("v" -> "42"))
    }
  }

  test("REPLACE TABLE without AS SELECT: declared schema, EMPTY content, history preserved (r14)") {
    withSql { s =>
      s.sql("CREATE TABLE graft.props.rp AS SELECT id FROM range(6)")
      val p = s"$warehouseRoot/props/rp"
      s.sql("REPLACE TABLE graft.props.rp (id BIGINT, note STRING) " +
        "TBLPROPERTIES ('k'='v')")
      assert(s.table("graft.props.rp").count() === 0,
        "no-query REPLACE empties the table under the declared schema")
      assert(s.table("graft.props.rp").columns.toSeq === Seq("id", "note"))
      assert(ManifestTable.tableProperties(s, p) === Map("k" -> "v"))
      assert(s.sql("SELECT * FROM graft.props.rp VERSION AS OF 1")
        .count() === 6, "the replaced snapshot stays time-travelable")
    }
  }
}
