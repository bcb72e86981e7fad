package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** CONVERT TO GRAFT — in-place adoption of a plain-parquet directory
  * (Delta's CONVERT TO DELTA shape): one manifest write, zero data
  * moved, partitioned layouts included, fully live afterwards.
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  test("flat convert: zero bytes move, reads equal, table is live (append + merge)") {
    val path = java.nio.file.Files.createTempDirectory("graft_cv1")
      .toString + "/t"
    val rows = (1L to 100L).map(i => (i, s"v$i"))
    rows.toDF("id", "v").repartition(4).write.parquet(path)
    val before = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(before.size === 4)
    val v = ManifestTable.convertInPlace(spark, path)
    assert(v === 1L)
    // zero file churn: the originals sit exactly where they were
    val after = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(after === before, "convert must move zero data files")
    assert(ManifestTable.read(spark, path).as[(Long, String)]
      .collect().toSet === rows.toSet)
    assert(ManifestTable.history(spark, path).select("operation")
      .as[String].head() === "CONVERT")
    // live table: append lands, merge rewrites only touched refs
    ManifestTable.append(Seq((101L, "new")).toDF("id", "v"), path)
    ManifestTable.merge(Seq((1L, "UPD")).toDF("id", "v"), path, "id")
    val got = ManifestTable.read(spark, path).as[(Long, String)]
      .collect().toSet
    assert(got === (rows.toSet - ((1L, "v1")) + ((1L, "UPD")) + ((101L, "new"))),
      s"post-convert churn wrong: ${got.take(5)}...")
    // a second convert is refused — it's a table now
    intercept[IllegalArgumentException] {
      ManifestTable.convertInPlace(spark, path)
    }
  }

  test("partitioned convert: k=v dirs adopt, partition column reads back, files untouched") {
    val path = java.nio.file.Files.createTempDirectory("graft_cv2")
      .toString + "/t"
    val df = Seq((1L, "a", 1995), (2L, "b", 1995), (3L, "c", 1996))
      .toDF("id", "v", "year")
    df.write.partitionBy("year").parquet(path)
    ManifestTable.convertInPlace(spark, path)
    val got = ManifestTable.read(spark, path)
      .select("id", "v", "year").as[(Long, String, Int)]
      .collect().toSet
    assert(got === Set((1L, "a", 1995), (2L, "b", 1995), (3L, "c", 1996)),
      s"partitioned convert wrong: $got")
    // partition-value filter still prunes through the adopted layout
    assert(ManifestTable.read(spark, path)
      .filter(col("year") === 1996).count() === 1)
  }

  test("SQL verb: CONVERT TO GRAFT; empty dir refused") {
    val b = java.nio.file.Files.createTempDirectory("graft_cv3").toString
    val path = s"$b/t"
    Seq((7L, "x")).toDF("id", "v").write.parquet(path)
    graft.GraftSession.withSqlExtensions(spark) { s =>
      val out = s.sql(s"CONVERT TO GRAFT '$path'").collect()
      assert(out.head.getLong(0) === 1L)
      assert(ManifestTable.read(s, path).count() === 1)
    }
    val empty = s"$b/empty"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    intercept[IllegalArgumentException] {
      ManifestTable.convertInPlace(spark, empty)
    }
  }
}
