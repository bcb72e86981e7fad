package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Column mapping: metadata-only RENAME / DROP COLUMN on manifest
  * tables. The contracts under test are Delta's (column-mapping mode):
  * a rename touches no data file, history time-travels under the names
  * of its day, a dropped-then-re-added column never resurrects old
  * data, and every metadata consumer (stats prune, bloom index, DV
  * anti-join, merge, clone, restore, checkpoint, change feed) resolves
  * through the logical→physical map.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("rename is metadata-only: same bytes, new name, old name time-travels") {
    val path = tmp("graft_cm1")
    val df = spark.range(0, 100).toDF("id")
      .withColumn("amount", col("id") * 10)
      .repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
    ManifestTable.write(df, path, statsCols = Seq("id", "amount"))
    val filesBefore = ManifestTable.manifestFiles(spark, path, 1)
    val sizesBefore = filesBefore.map { r =>
      r -> new java.io.File(path, r).length }.toMap

    val v2 = ManifestTable.renameColumn(spark, path, "amount", "price")
    assert(v2 === 2L)

    // physically the same files, byte for byte
    val filesAfter = ManifestTable.manifestFiles(spark, path, 2)
    assert(filesAfter.toSet === filesBefore.toSet)
    filesAfter.foreach { r =>
      assert(new java.io.File(path, r).length === sizesBefore(r)) }

    // logical surface renamed; content identical
    val cur = ManifestTable.read(spark, path)
    assert(cur.schema.fieldNames.toSeq === Seq("id", "price"))
    assert(cur.as[(Long, Long)].collect().toSet
      === (0L until 100L).map(i => (i, i * 10)).toSet)
    // time travel BEFORE the rename shows the old name
    assert(ManifestTable.readVersion(spark, path, 1)
      .schema.fieldNames.toSeq === Seq("id", "amount"))
    // the mapping is introspectable and points at the physical name
    assert(ManifestTable.columnMapping(spark, path) === Map("price" -> "amount"))

    // stats recorded under the physical name still prune under the new
    // logical name
    val (kept, total) = ManifestTable.pruneCount(spark, path, "price", 0, 199)
    assert(total === 4 && kept <= 1,
      s"stats prune through the rename: kept $kept of $total")

    // the rename commit itself feeds ZERO change rows
    assert(ManifestTable.changesForVersion(spark, path, 2).count() === 0L)
  }

  test("appends after a rename write the ORIGINAL physical name; old and new files read as one column") {
    val path = tmp("graft_cm2")
    ManifestTable.write(
      spark.range(0, 50).toDF("id").withColumn("amount", col("id") + 1000),
      path)
    ManifestTable.renameColumn(spark, path, "amount", "price")
    // the appender speaks the NEW logical name
    ManifestTable.append(
      spark.range(50, 80).toDF("id").withColumn("price", col("id") + 1000),
      path)
    val got = ManifestTable.read(spark, path).as[(Long, Long)].collect().toSet
    assert(got === (0L until 80L).map(i => (i, i + 1000)).toSet)
    // and the new file physically carries the original column name
    val newest = ManifestTable.manifestFiles(spark, path, 3)
      .filterNot(ManifestTable.manifestFiles(spark, path, 1).toSet)
    val raw = spark.read.parquet(newest.map(r => s"$path/$r"): _*)
    assert(raw.schema.fieldNames.toSet === Set("id", "amount"),
      "append must stage under the stable physical name")
  }

  test("drop then re-add: old rows read NULL — dropped data never resurrects") {
    val path = tmp("graft_cm3")
    ManifestTable.write(
      spark.range(0, 40).toDF("id").withColumn("note", concat(lit("old-"), col("id"))),
      path)
    ManifestTable.dropColumn(spark, path, "note")
    assert(ManifestTable.read(spark, path).schema.fieldNames.toSeq === Seq("id"))
    // re-add the SAME logical name via an evolving append
    ManifestTable.append(
      spark.range(40, 60).toDF("id").withColumn("note", concat(lit("new-"), col("id"))),
      path)
    val got = ManifestTable.read(spark, path)
      .select("id", "note").as[(Long, Option[String])].collect().toMap
    assert(got.size === 60)
    (0L until 40L).foreach(i => assert(got(i).isEmpty,
      s"row $i must NOT resurrect the dropped value, got ${got(i)}"))
    (40L until 60L).foreach(i => assert(got(i).contains(s"new-$i")))
    // fresh physical name assigned from the monotone counter
    val m = ManifestTable.columnMapping(spark, path)
    assert(m.keySet === Set("note") && m("note").startsWith("col-"))
  }

  test("merge keys on a renamed column; CoW rewrite keeps physical names") {
    val path = tmp("graft_cm4")
    ManifestTable.write(
      spark.range(0, 100).toDF("k").withColumn("v", col("k") * 2)
        .repartitionByRange(4, col("k")).sortWithinPartitions(col("k")),
      path, statsCols = Seq("k"))
    ManifestTable.renameColumn(spark, path, "k", "key")
    val updates = Seq((5L, -1L), (200L, -2L)).toDF("key", "v")
    ManifestTable.merge(updates, path, "key", statsCols = Seq("key"))
    val got = ManifestTable.read(spark, path).as[(Long, Long)].collect().toMap
    assert(got(5L) === -1L && got(200L) === -2L && got(6L) === 12L
      && got.size === 101)
    // every data file still speaks the original physical name
    val raw = spark.read.parquet(
      ManifestTable.manifestFiles(spark, path,
        ManifestTable.currentVersion(spark, path).get).map(r => s"$path/$r"): _*)
    assert(raw.schema.fieldNames.toSet === Set("k", "v"))
  }

  test("DV merge then rename of the DV key: anti-join and change feed resolve through the map") {
    val path = tmp("graft_cm5")
    ManifestTable.write(
      spark.range(0, 60).toDF("k").withColumn("v", col("k") + 7)
        .repartitionByRange(3, col("k")).sortWithinPartitions(col("k")),
      path, statsCols = Seq("k"))
    // sparse delete via deletion vectors (no rewrite)
    val del = Seq((10L, 17L, true), (11L, 18L, true)).toDF("k", "v", "_del")
    val vDel = ManifestTable.merge(del, path, "k", deleteCol = Some("_del"),
      deleteVectors = true)
    ManifestTable.renameColumn(spark, path, "k", "key")
    val got = ManifestTable.read(spark, path).as[(Long, Long)].collect().toMap
    assert(!got.contains(10L) && !got.contains(11L) && got.size === 58)
    // the DV delete version still replays its two delete rows (computed
    // with the historical pre-rename state)
    val changes = ManifestTable.changesForVersion(spark, path, vDel)
    assert(changes.filter(col("_change") === "delete").count() === 2L)
    // and dropping the DV key is refused while DVs are live
    val e = intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, path, "key") }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("CHECK constraints block rename and drop of referenced columns") {
    val path = tmp("graft_cm6")
    ManifestTable.write(spark.range(1, 20).toDF("id")
      .withColumn("qty", col("id") * 3), path)
    ManifestTable.addCheckConstraint(spark, path, "pos_qty", "qty > 0")
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, path, "qty", "quantity") }
    assert(e1.getMessage.contains("pos_qty"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, path, "qty") }
    assert(e2.getMessage.contains("pos_qty"))
    // unreferenced columns rename freely, and the constraint still
    // enforces afterwards
    ManifestTable.renameColumn(spark, path, "id", "order_id")
    intercept[Exception] {
      ManifestTable.append(Seq((99L, -5L)).toDF("order_id", "qty"), path) }
    ManifestTable.dropCheckConstraint(spark, path, "pos_qty")
    ManifestTable.renameColumn(spark, path, "qty", "quantity")
    assert(ManifestTable.read(spark, path).schema.fieldNames.toSeq
      === Seq("order_id", "quantity"))
  }

  test("bloom point lookup prunes under the renamed name; mapping rides checkpoints and vacuum") {
    val path = tmp("graft_cm7")
    ManifestTable.setBloomIndex(spark, path, Seq("user"), items = 1L << 12)
    ManifestTable.write(
      spark.range(0, 2000).toDF("id")
        .withColumn("user", pmod(col("id") * 2654435761L, lit(2000)))
        .repartitionByRange(8, col("id")).sortWithinPartitions(col("id")),
      path, statsCols = Seq("id"))
    ManifestTable.renameColumn(spark, path, "user", "user_id")
    val (cand, tot) = ManifestTable.pointLookupCount(spark, path, "user_id", 42L)
    assert(tot === 8 && cand <= 3,
      s"bloom prune through the rename: $cand of $tot")
    assert(ManifestTable.readWhereEquals(spark, path, "user_id", 42L)
      .count() === 1L)
    // vacuum pins a checkpoint at the floor; the mapping must ride it
    ManifestTable.append(spark.range(2000, 2010).toDF("id")
      .withColumn("user_id", col("id")), path)
    ManifestTable.vacuum(spark, path, keep = 1)
    val cur = ManifestTable.read(spark, path)
    assert(cur.schema.fieldNames.toSeq === Seq("id", "user_id"))
    assert(cur.count() === 2010)
    assert(ManifestTable.readWhereEquals(spark, path, "user_id", 42L)
      .count() === 1L)
  }

  test("shallow clone and restore carry the mapping") {
    val src = tmp("graft_cm8")
    ManifestTable.write(spark.range(0, 30).toDF("id")
      .withColumn("amt", col("id") * 5), src)
    ManifestTable.renameColumn(spark, src, "amt", "amount")
    val dst = tmp("graft_cm8d")
    ManifestTable.cloneShallow(spark, src, dst)
    val c = ManifestTable.read(spark, dst)
    assert(c.schema.fieldNames.toSeq === Seq("id", "amount"))
    assert(c.count() === 30)
    assert(ManifestTable.columnMapping(spark, dst) === Map("amount" -> "amt"))

    // restore across a rename: rolls the logical schema (and map) back
    val v2 = ManifestTable.currentVersion(spark, src).get
    ManifestTable.renameColumn(spark, src, "amount", "total")
    ManifestTable.restore(spark, src, v2)
    assert(ManifestTable.read(spark, src).schema.fieldNames.toSeq
      === Seq("id", "amount"))
    // and restore BEFORE mapping ever existed restores the pre-mapping
    // logical surface
    ManifestTable.restore(spark, src, 1L)
    assert(ManifestTable.read(spark, src).schema.fieldNames.toSeq
      === Seq("id", "amt"))
    assert(ManifestTable.read(spark, src).as[(Long, Long)].collect().toSet
      === (0L until 30L).map(i => (i, i * 5)).toSet)
  }

  test("PARTITIONED tables rename: data column, partition column itself, prune under the new name, merge and overwrite keep the physical layout") {
    val path = tmp("graft_cm_part")
    val df = spark.range(0, 300).toDF("id")
      .withColumn("part", (col("id") % 3).cast("int"))
      .withColumn("v", col("id") * 10)
    ManifestTable.write(df, path, partitionCols = Seq("part"))
    // 1) rename a DATA column on the partitioned layout: metadata-only
    val files1 = ManifestTable.manifestFiles(spark, path, 1)
    ManifestTable.renameColumn(spark, path, "v", "amount")
    assert(ManifestTable.manifestFiles(spark, path, 2) === files1,
      "rename on a partitioned table must be metadata-only")
    val got = ManifestTable.read(spark, path)
    assert(got.schema.fieldNames.toSet === Set("id", "part", "amount"))
    assert(got.filter(col("part") === 1).count() === 100)
    // 2) rename the PARTITION column itself: dirs keep the physical
    //    name, reads surface the logical one, value prune still works
    ManifestTable.renameColumn(spark, path, "part", "bucket")
    val got2 = ManifestTable.read(spark, path)
    assert(got2.schema.fieldNames.toSet === Set("id", "bucket", "amount"))
    assert(got2.filter(col("bucket") === 2).count() === 100)
    assert(got2.filter(col("bucket") === col("id") % 3).count() === 300)
    val (cand, total) = ManifestTable.pruneCount(spark, path, "bucket",
      2.0, 2.0)
    assert(cand < total && cand >= 1,
      s"partition prune under the RENAMED name: $cand of $total")
    // 3) merge keyed on the renamed partition column's table: rewrite
    //    stays inside the physical partition layout
    val mv = ManifestTable.merge(
      Seq((7L, 1, -5L)).toDF("id", "bucket", "amount"), path, "id")
    val after = ManifestTable.manifestFiles(spark, path, mv)
    assert(after.exists(r => r.contains("part=") && !files1.contains(r)),
      s"merge rewrite must land in the physical (part=) layout: $after")
    assert(ManifestTable.read(spark, path).filter(col("id") === 7)
      .select("amount").head().getLong(0) === -5L)
    // 4) partitioned OVERWRITE on the mapped table: logical partition
    //    name in, physical dirs out
    ManifestTable.write(
      ManifestTable.read(spark, path).filter(col("id") < 150),
      path, partitionCols = Seq("bucket"))
    val files5 = ManifestTable.manifestFiles(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    assert(files5.forall(_.contains("part=")),
      s"overwrite must write PHYSICAL partition dirs: $files5")
    assert(ManifestTable.read(spark, path).count() === 150)
    assert(ManifestTable.read(spark, path)
      .filter(col("bucket") === col("id") % 3).count() === 150)
    // 5) dropping the partition column is refused; a data column drops
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, path, "bucket")
    }
    ManifestTable.dropColumn(spark, path, "amount")
    assert(ManifestTable.read(spark, path).schema.fieldNames.toSet ===
      Set("id", "bucket"))
    // time travel still reads pre-rename names
    assert(ManifestTable.readVersion(spark, path, 1)
      .schema.fieldNames.toSet === Set("id", "part", "v"))
  }

  test("compact folds dropped physical columns out of the files") {
    val path = tmp("graft_cm9")
    ManifestTable.write(
      spark.range(0, 50).toDF("id").withColumn("junk", lit("x"))
        .withColumn("v", col("id") * 2), path)
    ManifestTable.dropColumn(spark, path, "junk")
    ManifestTable.compact(spark, path, targetFiles = 1)
    val files = ManifestTable.manifestFiles(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    val raw = spark.read.parquet(files.map(r => s"$path/$r"): _*)
    assert(raw.schema.fieldNames.toSet === Set("id", "v"),
      "compact must not carry the dropped physical column forward")
    assert(ManifestTable.read(spark, path).count() === 50)
  }
}
