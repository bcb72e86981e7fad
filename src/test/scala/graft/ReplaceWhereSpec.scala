package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Round-12 ACID surface: selective overwrite (Delta's `replaceWhere`),
  * time-based retention (`VACUUM ... RETAIN n HOURS`), and NOT NULL
  * column invariants.
  */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def fileSig(path: String, rels: Seq[String]): Map[String, (Long, Long)] =
    rels.map { rel =>
      val f = new java.io.File(s"$path/$rel")
      rel -> ((f.length, f.lastModified))
    }.toMap

  test("overwriteWhere replaces exactly the matching slice; untouched files carry byte-identical") {
    val path = java.nio.file.Files.createTempDirectory("graft_rw1").toString + "/t"
    val df = spark.range(0, 400).toDF("id")
      .withColumn("day", (col("id") / 100).cast("int"))
      .withColumn("v", col("id"))
    ManifestTable.write(
      df.repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      path, statsCols = Seq("id", "day"))
    val files1 = ManifestTable.manifestFiles(spark, path, 1)
    assert(files1.size === 4)
    val sig = fileSig(path, files1)
    // backfill day=1 with corrected values (and a different row count)
    val batch = spark.range(100, 180).toDF("id")
      .withColumn("day", lit(1).cast("int"))
      .withColumn("v", col("id") * 10)
    val v = ManifestTable.overwriteWhere(batch, path, col("day") === 1)
    assert(v === 2L)
    val files2 = ManifestTable.manifestFiles(spark, path, 2)
    val carried = files2.filter(files1.contains)
    assert(carried.size === 3, s"3 of 4 range files hold no day=1 rows: $files2")
    carried.foreach { rel =>
      val f = new java.io.File(s"$path/$rel")
      assert((f.length, f.lastModified) === sig(rel), s"$rel was rewritten")
    }
    val got = ManifestTable.read(spark, path)
      .select("id", "v").as[(Long, Long)].collect().toMap
    assert(got.size === 380, "100 old slice rows out, 80 new in")
    (0L until 100L).foreach(i => assert(got(i) === i))
    (100L until 180L).foreach(i => assert(got(i) === i * 10))
    (180L until 200L).foreach(i => assert(!got.contains(i),
      s"old slice row id=$i must be gone"))
    (200L until 400L).foreach(i => assert(got(i) === i))
    // history classifies the commit
    assert(ManifestTable.history(spark, path)
      .select("version", "operation").as[(Long, String)].collect()
      .toMap.apply(2L) === "REPLACE_WHERE")
    // a batch violating its own predicate is refused BEFORE staging
    intercept[IllegalArgumentException] {
      ManifestTable.overwriteWhere(
        Seq((999L, 3, 0L)).toDF("id", "day", "v"), path, col("day") === 1)
    }
    assert(ManifestTable.currentVersion(spark, path) === Some(2L),
      "refused replaceWhere must not commit")
    // replacing an EMPTY slice is a pure append of the batch
    val v3 = ManifestTable.overwriteWhere(
      Seq((1000L, 9, 1L)).toDF("id", "day", "v"), path, col("day") === 9)
    assert(v3 === 3L)
    assert(ManifestTable.read(spark, path).count() === 381)
  }

  test("INSERT OVERWRITE WHERE from SQL ≡ overwriteWhere; time travel sees the pre-replace slice") {
    val root = java.nio.file.Files.createTempDirectory("graft_rw2").toString
    val path = s"$root/t"
    ManifestTable.write(
      spark.range(0, 100).toDF("id")
        .withColumn("grp", (col("id") % 2).cast("int"))
        .withColumn("v", col("id")), path)
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = try org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val rv = s.sql(
        s"""INSERT OVERWRITE '$path' WHERE grp = 1
            SELECT id, CAST(1 AS INT) AS grp, id * 100 AS v
            FROM graft.'$path' WHERE grp = 1 AND id < 10""")
      assert(rv.head().getLong(0) === 2L)
      val got = ManifestTable.read(s, path).select("id", "v")
        .as[(Long, Long)].collect().toMap
      assert(got.size === 55, "50 even survivors + 5 replaced odds")
      assert(got(1L) === 100L && got(9L) === 900L && got(2L) === 2L)
      assert(!got.contains(11L), "unreplaced odd rows left the slice")
      assert(ManifestTable.readVersion(s, path, 1).count() === 100)
    } finally org.apache.spark.sql.SparkSession.setActiveSession(base)
  }

  test("vacuumHours: commits inside the window survive, outside sweep; time travel past the horizon fails") {
    val path = java.nio.file.Files.createTempDirectory("graft_rw3").toString + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), path)   // v1
    ManifestTable.append(Seq((2L, "b")).toDF("id", "v"), path)  // v2
    ManifestTable.append(Seq((3L, "c")).toDF("id", "v"), path)  // v3
    val t2 = ManifestTable.commitTimestamp(spark, path, 2L)
    // horizon between v1 and v2 (commit wall-times are monotone):
    // pretend "now" is such that a 1-hour window opens just before v2
    val now = t2 + 3600L * 1000 - 1
    val (wouldDrop, _) = ManifestTable.vacuumHoursDryRun(spark, path, 1.0, now)
    assert(wouldDrop === Seq(1L), s"only v1 is outside the window: $wouldDrop")
    assert(ManifestTable.versions(spark, path) === Seq(1L, 2L, 3L),
      "dry run sweeps nothing")
    val dropped = ManifestTable.vacuumHours(spark, path, 1.0, now)
    assert(dropped === Seq(1L))
    assert(ManifestTable.versions(spark, path) === Seq(2L, 3L))
    assert(ManifestTable.readVersion(spark, path, 2).count() === 2)
    intercept[Exception] { ManifestTable.readVersion(spark, path, 1).count() }
    // a window covering nothing still keeps the current version
    val dropped2 = ManifestTable.vacuumHours(spark, path, 0.0,
      System.currentTimeMillis() + 10L * 3600 * 1000)
    assert(ManifestTable.versions(spark, path) === Seq(3L),
      s"zero-hour retention keeps only the current version ($dropped2)")
    assert(ManifestTable.read(spark, path).count() === 3)
  }

  test("NOT NULL invariant: violating append rejected atomically; survives restore and clone; SQL verbs") {
    val root = java.nio.file.Files.createTempDirectory("graft_rw4").toString
    val path = s"$root/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val cv = ManifestTable.setNotNull(spark, path, "v")
    assert(cv === 2L)
    assert(ManifestTable.notNullColumns(spark, path) === Seq("v"))
    // violating append fails atomically — no partial commit
    intercept[Exception] {
      ManifestTable.append(Seq((3L, null: String)).toDF("id", "v"), path)
    }
    assert(ManifestTable.currentVersion(spark, path) === Some(2L))
    assert(ManifestTable.read(spark, path).count() === 2)
    // valid append unaffected
    ManifestTable.append(Seq((3L, "c")).toDF("id", "v"), path)   // v3
    // declaring over existing NULLs is refused
    val p2 = s"$root/t2"
    ManifestTable.write(Seq((1L, "a"), (2L, null: String)).toDF("id", "v"), p2)
    intercept[IllegalArgumentException] {
      ManifestTable.setNotNull(spark, p2, "v")
    }
    // clone carries the invariant
    val dst = s"$root/clone"
    ManifestTable.cloneShallow(spark, path, dst)
    intercept[Exception] {
      ManifestTable.append(Seq((9L, null: String)).toDF("id", "v"), dst)
    }
    // drop, then the append passes
    ManifestTable.dropNotNull(spark, path, "v")                  // v4
    ManifestTable.append(Seq((4L, null: String)).toDF("id", "v"), path) // v5
    assert(ManifestTable.read(spark, path).count() === 4)
    // restore to v3 brings the invariant BACK (metadata state rolls)
    ManifestTable.restore(spark, path, 3L)
    intercept[Exception] {
      ManifestTable.append(Seq((5L, null: String)).toDF("id", "v"), path)
    }
    // SQL verbs
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = try org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      s.sql(s"ALTER TABLE '$path' ALTER COLUMN v DROP NOT NULL")
      assert(ManifestTable.notNullColumns(s, path).isEmpty)
      s.sql(s"ALTER TABLE '$path' ALTER COLUMN v SET NOT NULL")
      assert(ManifestTable.notNullColumns(s, path) === Seq("v"))
      // VACUUM RETAIN n HOURS parses and keeps a wide-open window
      val kept = s.sql(s"VACUUM '$path' RETAIN 1000000 HOURS DRY RUN")
      assert(kept.collect().isEmpty, "everything inside the window")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(base)
  }

  test("overwriteWhere under row tracking: carried rows keep ids, batch draws fresh ids above high water") {
    val path = java.nio.file.Files.createTempDirectory("graft_rw5").toString + "/t"
    ManifestTable.enableRowTracking(spark, path)
    ManifestTable.write(
      spark.range(0, 100).toDF("id")
        .withColumn("grp", (col("id") % 2).cast("int"))
        .withColumn("v", col("id"))
        .repartitionByRange(2, col("id")), path)
    val before = ManifestTable.readWithRowIds(spark, path)
      .select("id", ManifestTable.RowIdCol).as[(Long, Long)].collect().toMap
    val maxBefore = before.values.max
    val batch = spark.range(200, 210).toDF("id")
      .withColumn("grp", lit(1).cast("int"))
      .withColumn("v", col("id"))
    ManifestTable.overwriteWhere(batch, path, col("grp") === 1)
    val after = ManifestTable.readWithRowIds(spark, path)
      .select("id", ManifestTable.RowIdCol).as[(Long, Long)].collect().toMap
    // carried (even) rows keep their ids
    before.keys.filter(_ % 2 == 0).foreach(i =>
      assert(after(i) === before(i), s"carried row $i changed id"))
    // replaced rows are gone; new batch rows have fresh ids above water
    val newIds = (200L until 210L).map(after)
    assert(newIds.forall(_ > maxBefore), "batch ids must be fresh")
    assert(newIds.distinct.size === 10)
    // a follow-up insert cannot collide with them
    ManifestTable.append(Seq((999L, 1, 999L)).toDF("id", "grp", "v"), path)
    val all = ManifestTable.readWithRowIds(spark, path)
      .select(ManifestTable.RowIdCol).as[Long].collect()
    assert(all.distinct.length === all.length, "row ids must stay unique")
  }
}
