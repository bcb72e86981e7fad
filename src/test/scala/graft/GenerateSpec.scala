package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 GENERATE symlink_format_manifest: Delta's external-reader
  * export — per-partition text manifests of fully-qualified live-file
  * URIs, regenerated from the current snapshot, refused under live
  * deletion vectors.
  */
class GenerateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def manifestLines(path: String): Map[String, Seq[String]] = {
    val root = new java.io.File(path, "_symlink_format_manifest")
    def walk(dir: java.io.File, part: String): Seq[(String, Seq[String])] = {
      val here = new java.io.File(dir, "manifest")
      val own =
        if (here.isFile)
          Seq(part -> scala.io.Source.fromFile(here, "UTF-8")
            .getLines().toSeq.filter(_.nonEmpty))
        else Nil
      own ++ dir.listFiles().toSeq.filter(_.isDirectory).flatMap(d =>
        walk(d, if (part.isEmpty) d.getName else s"$part/${d.getName}"))
    }
    walk(root, "").toMap
  }

  test("unpartitioned: one root manifest listing exactly the live files; regenerates after delete") {
    val p = tmp("graft_gen")
    ManifestTable.write(spark.range(0, 100).toDF("id").repartition(3), p,
      statsCols = Seq("id"))
    assert(ManifestTable.generateSymlinkManifest(spark, p) === 1)
    val lines = manifestLines(p)("")
    val st = ManifestTable.resolveState(spark, p,
      ManifestTable.currentVersion(spark, p).get)
    assert(lines.size === st.files.size)
    assert(lines.forall(_.startsWith("file:")), lines.take(2).toString)
    // every live file appears, fully qualified
    assert(st.files.forall(r => lines.exists(_.endsWith(r))), lines.toString)
    // an external engine can read the listed files directly
    assert(spark.read.parquet(lines: _*).count() === 100)
    // rewrite commit → regenerate reflects the NEW snapshot only
    ManifestTable.deleteWhere(spark, p, col("id") < 50)
    ManifestTable.generateSymlinkManifest(spark, p)
    val after = manifestLines(p)("")
    assert(spark.read.parquet(after: _*).count() === 50)
    val stale = lines.toSet -- after.toSet
    assert(stale.nonEmpty && after.toSet.intersect(stale).isEmpty)
  }

  test("partitioned layout: one manifest per k=v dir; SQL verb + DV refusal") {
    val p = tmp("graft_gen_part")
    ManifestTable.write(
      spark.range(0, 40).toDF("id").withColumn("part", col("id") % 4),
      p, partitionCols = Seq("part"))
    val n = ManifestTable.generateSymlinkManifest(spark, p)
    assert(n === 4)
    val byPart = manifestLines(p)
    assert(byPart.keySet === Set("part=0", "part=1", "part=2", "part=3"))
    assert(spark.read.parquet(byPart.values.flatten.toSeq: _*).count() === 40)

    // SQL verb over an extended session
    val base = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = try SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    finally { SparkSession.setDefaultSession(base); SparkSession.setActiveSession(base) }
    SparkSession.setActiveSession(s)
    try {
      val cnt = s.sql(s"GENERATE symlink_format_manifest FOR TABLE '$p'")
        .head().getLong(0)
      assert(cnt === 4L)
      intercept[Exception] {
        s.sql(s"GENERATE symlink_manifest FOR TABLE '$p'").collect()
      }
    } finally SparkSession.setActiveSession(base)

    // DV refusal: a DV-masked table cannot serve symlink readers
    val pdv = tmp("graft_gen_dv")
    ManifestTable.write(spark.range(0, 10).toDF("id"), pdv,
      statsCols = Seq("id"))
    ManifestTable.deleteWhereDV(spark, pdv, col("id") === 3L, "id")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.generateSymlinkManifest(spark, pdv)
    }
    assert(e.getMessage.contains("deletion"), e.getMessage)
  }

  test("column-mapped table refuses GENERATE: physical col-N names are unreadable to symlink consumers (r14)") {
    val p = tmp("graft_gen_cm")
    ManifestTable.write(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "amount"), p)
    // any rename turns column mapping ON for the table's lifetime —
    // from here the parquet files carry physical names
    ManifestTable.renameColumn(spark, p, "amount", "price")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.generateSymlinkManifest(spark, p)
    }
    assert(e.getMessage.contains("column mapping"), e.getMessage)
  }
}
