package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Round-11 incremental clustering (the Delta 3.x liquid-clustering
  * shape, range-overlap maintenance): declared cluster columns sort
  * every staged file locally; `optimizeClustered` rewrites ONLY
  * unclustered files + the clustered files whose key ranges overlap
  * them — an append-mostly table pays O(new data) per maintenance run.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def sig(path: String, rels: Seq[String]): Map[String, (Long, Long)] =
    rels.map { rel =>
      val f = new java.io.File(s"$path/$rel")
      rel -> ((f.length, f.lastModified))
    }.toMap

  test("incremental maintenance: disjoint appends recluster alone, overlapping appends merge only the overlapped tail, full coverage is a no-op") {
    val path = java.nio.file.Files.createTempDirectory("graft_cl1").toString + "/t"
    ManifestTable.setClusterColumns(spark, path, Seq("id"))            // v1
    // scattered initial load: 4 files, each spanning the whole domain
    ManifestTable.write(
      spark.range(0, 4000).toDF("id").withColumn("v", col("id"))
        .repartition(4), path)                                         // v2
    val st2 = ManifestTable.resolveState(spark, path, 2L)
    assert(st2.clusterCols === Seq("id"))
    assert(st2.statsSchemaCols.contains("id"),
      "cluster columns must join the stats schema")
    assert(st2.clusteredFiles.isEmpty, "ingested files are not clustered yet")
    // first maintenance run clusters everything
    val v3 = ManifestTable.optimizeClustered(spark, path)              // v3
    assert(v3 === 3L)
    val st3 = ManifestTable.resolveState(spark, path, 3L)
    assert(st3.clusteredFiles.toSet === st3.files.toSet,
      "after the first run every live file is clustered")
    // ...and clustering actually prunes now (disjoint file ranges)
    val (cand, total) = ManifestTable.pruneCount(spark, path, "id", 0.0, 999.0)
    assert(cand < total, s"clustered table must prune: $cand/$total")
    // fully clustered -> NO-OP, no commit
    assert(ManifestTable.optimizeClustered(spark, path) === 3L)
    assert(ManifestTable.currentVersion(spark, path).get === 3L)
    // DISJOINT append: its range [100000, 101000) overlaps no
    // clustered file, so maintenance rewrites exactly that one file
    ManifestTable.append(
      spark.range(100000, 101000).toDF("id").withColumn("v", col("id"))
        .coalesce(1), path)                                            // v4
    val st4 = ManifestTable.resolveState(spark, path, 4L)
    val carriedSig = sig(path, st4.clusteredFiles)
    val v5 = ManifestTable.optimizeClustered(spark, path)              // v5
    val st5 = ManifestTable.resolveState(spark, path, v5)
    st4.clusteredFiles.foreach { rel =>
      assert(st5.files.contains(rel), s"$rel must carry")
      val f = new java.io.File(s"$path/$rel")
      assert((f.length, f.lastModified) === carriedSig(rel),
        s"disjoint maintenance must not rewrite $rel")
    }
    assert(st5.clusteredFiles.toSet === st5.files.toSet)
    // OVERLAPPING append: range [500, 1500) interleaves SOME clustered
    // files — maintenance merges those, carries the rest (at least the
    // [100000,101000) file stays untouched)
    ManifestTable.append(
      spark.range(500, 1500).toDF("id").withColumn("v", col("id"))
        .coalesce(1), path)                                            // v6
    val st6 = ManifestTable.resolveState(spark, path, 6L)
    val tailFile = st6.clusteredFiles.find { rel =>
      st6.stats(rel)("id").min.toString.toDouble >= 100000.0
    }.get
    val tailSig = sig(path, Seq(tailFile))(tailFile)
    val v7 = ManifestTable.optimizeClustered(spark, path)              // v7
    val st7 = ManifestTable.resolveState(spark, path, v7)
    assert(st7.files.contains(tailFile) && {
      val f = new java.io.File(s"$path/$tailFile")
      (f.length, f.lastModified) == tailSig
    }, "non-overlapping clustered files must carry byte-identical")
    assert(st7.clusteredFiles.toSet === st7.files.toSet)
    // content never drifts through any of it
    val got = ManifestTable.read(spark, path).select("id").as[Long]
      .collect().sorted
    assert(got.length === 6000)
    assert(got.take(500).toSeq === (0L until 500L).toSeq)
    // a merge rewrite RETIRES the touched file's clustered mark, so the
    // next maintenance run picks it up (and only its range group)
    ManifestTable.merge(Seq((42L, -1L)).toDF("id", "v"), path, "id")   // v8
    val st8 = ManifestTable.resolveState(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    assert(st8.clusteredFiles.size < st8.files.size,
      "the merge output must arrive unclustered")
    val v9 = ManifestTable.optimizeClustered(spark, path)
    val st9 = ManifestTable.resolveState(spark, path, v9)
    assert(st9.clusteredFiles.toSet === st9.files.toSet)
    assert(ManifestTable.read(spark, path).filter(col("id") === 42)
      .select("v").head().getLong(0) === -1L)
  }

  test("STRING cluster columns: maintenance range-sorts without numeric box arithmetic; non-numeric dims overlap conservatively") {
    val path = java.nio.file.Files.createTempDirectory("graft_cl4").toString + "/t"
    ManifestTable.setClusterColumns(spark, path, Seq("name"))
    ManifestTable.write(
      spark.range(0, 300).toDF("id")
        .withColumn("name", concat(lit("user-"),
          format_string("%03d", col("id"))))
        .repartition(3), path)
    val v = ManifestTable.optimizeClustered(spark, path)
    val st = ManifestTable.resolveState(spark, path, v)
    assert(st.clusteredFiles.toSet === st.files.toSet)
    assert(ManifestTable.read(spark, path).count() === 300)
    // append + second run: a string dimension has no numeric box, so
    // the clustered set conservatively merges — still correct, still
    // converges to full coverage
    ManifestTable.append(spark.range(300, 310).toDF("id")
      .withColumn("name", concat(lit("zzz-"), col("id").cast("string")))
      .coalesce(1), path)
    val v2 = ManifestTable.optimizeClustered(spark, path)
    val st2 = ManifestTable.resolveState(spark, path, v2)
    assert(st2.clusteredFiles.toSet === st2.files.toSet)
    assert(ManifestTable.read(spark, path).count() === 310)
    assert(ManifestTable.read(spark, path)
      .filter(col("name") === "user-042").count() === 1)
  }

  test("clustering + stats-schema state rides CHECKPOINTS: resolution through a folded log keeps every round-11 field") {
    val path = java.nio.file.Files.createTempDirectory("graft_cl5").toString + "/t"
    ManifestTable.setClusterColumns(spark, path, Seq("id"))            // v1
    ManifestTable.setStatsColumns(spark, path, Seq("id", "v"))         // v2
    ManifestTable.write(spark.range(0, 100).toDF("id")
      .withColumn("v", col("id")).repartition(2), path)                // v3
    ManifestTable.optimizeClustered(spark, path)                       // v4
    // push past the checkpoint interval (16) with appends
    (1 to 14).foreach(i => ManifestTable.append(
      spark.range(100L + i, 101L + i).toDF("id")
        .withColumn("v", col("id")).coalesce(1), path))                // v18
    val cur = ManifestTable.currentVersion(spark, path).get
    assert(cur >= 17L)
    assert(new java.io.File(s"$path/_graft_checkpoint-v16.json").isFile,
      "interval checkpoint must exist")
    // drop history BELOW the checkpoint so resolution MUST go through it
    ManifestTable.vacuum(spark, path, keep = 2)
    val st = ManifestTable.resolveState(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    assert(st.clusterCols === Seq("id"),
      "cluster columns must survive the checkpoint fold")
    assert(st.statsSchemaCols.toSet === Set("id", "v"),
      "stats schema must survive the checkpoint fold")
    assert(st.clusteredFiles.nonEmpty &&
      st.clusteredFiles.toSet.subsetOf(st.files.toSet),
      "clustered marks must survive and stay a subset of live files")
    // ...and still DRIVE behavior: an append auto-collects stats and
    // the next maintenance run converges
    ManifestTable.append(spark.range(500, 510).toDF("id")
      .withColumn("v", col("id")).coalesce(1), path)
    val (cand, total) = ManifestTable.pruneCount(spark, path, "id",
      500.0, 510.0)
    assert(cand < total, "post-checkpoint appends must keep auto-stats")
    ManifestTable.optimizeClustered(spark, path)
    val st2 = ManifestTable.resolveState(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    assert(st2.clusteredFiles.toSet === st2.files.toSet)
  }

  test("cluster maintenance is CDC-silent: the change feed replays a CLUSTER commit as zero rows") {
    val path = java.nio.file.Files.createTempDirectory("graft_cl3").toString + "/t"
    ManifestTable.setClusterColumns(spark, path, Seq("id"))
    ManifestTable.write(spark.range(0, 200).toDF("id")
      .withColumn("v", col("id")).repartition(3), path)               // v2
    val cv = ManifestTable.optimizeClustered(spark, path)             // v3
    // a pure layout rewrite must cancel multiset-exactly — a feed
    // consumer sees NOTHING from maintenance
    assert(ManifestTable.changesForVersion(spark, path, cv).count() === 0,
      "CLUSTER commits must replay as zero changes")
    // while a real append right after still replays as its inserts
    ManifestTable.append(spark.range(200, 210).toDF("id")
      .withColumn("v", col("id")).coalesce(1), path)
    val v4 = ManifestTable.currentVersion(spark, path).get
    assert(ManifestTable.changesForVersion(spark, path, v4)
      .select("id").as[Long].collect().sorted.toSeq ===
      (200L until 210L).toSeq)
  }

  test("2-D clustering, SQL surface, clone/restore carry, row ids survive") {
    val root = java.nio.file.Files.createTempDirectory("graft_cl2").toString
    val path = s"$root/t"
    graft.GraftSession.withSqlExtensions(spark) { s =>
      s.sql(s"ALTER TABLE '$path' CLUSTER BY (x, y)")
      ManifestTable.write(
        s.range(0, 4096).toDF("id")
          .withColumn("x", (col("id") % 64).cast("int"))
          .withColumn("y", (col("id") / 64).cast("int"))
          .repartition(8), path)
      // SQL OPTIMIZE on a clustered table runs the INCREMENTAL recluster
      val ov = s.sql(s"OPTIMIZE '$path' INTO 16 FILES")
      assert(ov.head().getLong(0) === 3L)
      val (cx, tx) = ManifestTable.pruneCount(s, path, "x", 0.0, 7.0)
      val (cy, ty) = ManifestTable.pruneCount(s, path, "y", 0.0, 7.0)
      assert(tx === 16 && cx < tx && cy < ty,
        s"2-D cluster must prune both axes: x $cx/$tx y $cy/$ty")
      // immediate OPTIMIZE again: no-op (fully clustered)
      assert(s.sql(s"OPTIMIZE '$path'").head().getLong(0) === 3L)
      // history classifies declaration and maintenance
      val ops = ManifestTable.history(s, path)
        .select("version", "operation")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ops(1L) === "CLUSTER_BY" && ops(3L) === "CLUSTER")
      // clone carries the clustering state
      val dst = s"$root/clone"
      ManifestTable.cloneShallow(s, path, dst)
      val stc = ManifestTable.resolveState(s, dst,
        ManifestTable.currentVersion(s, dst).get)
      assert(stc.clusterCols === Seq("x", "y"))
      assert(stc.clusteredFiles.size === stc.files.size)
      // restore rolls the clustering state back exactly
      ManifestTable.append(s.range(9000, 9100).toDF("id")
        .withColumn("x", lit(99)).withColumn("y", lit(99))
        .select(col("id"), col("x").cast("int"), col("y").cast("int")), path)
      ManifestTable.optimizeClustered(s, path)
      ManifestTable.restore(s, path, 3L)
      val str = ManifestTable.resolveState(s, path,
        ManifestTable.currentVersion(s, path).get)
      assert(str.clusteredFiles.toSet ===
        ManifestTable.resolveState(s, path, 3L).clusteredFiles.toSet,
        "restore must roll the clustered set back to the target's")
    }
    // row tracking: ids ride the cluster rewrite verbatim
    val p2 = s"$root/rt"
    ManifestTable.enableRowTracking(spark, p2)
    ManifestTable.setClusterColumns(spark, p2, Seq("id"))
    ManifestTable.write(spark.range(0, 100).toDF("id")
      .withColumn("v", lit(0L)).repartition(2), p2)
    val before = ManifestTable.readWithRowIds(spark, p2)
      .select("id", ManifestTable.RowIdCol).as[(Long, Long)]
      .collect().toMap
    ManifestTable.optimizeClustered(spark, p2)
    val after = ManifestTable.readWithRowIds(spark, p2)
      .select("id", ManifestTable.RowIdCol).as[(Long, Long)]
      .collect().toMap
    assert(after === before, "cluster rewrite must carry every stable id")
  }
}
