package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Round-11 type-widening schema evolution (Delta 3.x): an append may
  * widen int→long / float→double (and the integral chain); the
  * committed schema takes the wider type and OLD FILES ARE NEVER
  * REWRITTEN — Spark 4's parquet readers read the narrow physical type
  * up under the committed schema.
  */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("int→long widening append: schema widens, old files untouched, reads unify; narrower batches read up afterwards") {
    val path = java.nio.file.Files.createTempDirectory("graft_tw1").toString + "/t"
    val ints = spark.range(0, 10).select(col("id"),
      col("id").cast("int").as("v"))
    ManifestTable.write(ints, path)                                    // v1: v int
    val files1 = ManifestTable.manifestFiles(spark, path, 1)
    val sig = files1.map { rel =>
      val f = new java.io.File(s"$path/$rel"); rel -> (f.length, f.lastModified)
    }.toMap
    val longs = spark.range(10, 20).select(col("id"),
      (col("id") * 1000000000000L).as("v"))
    ManifestTable.append(longs, path)                                  // v2: widens
    assert(ManifestTable.manifestSchema(spark, path, 2).get("v").dataType
      === org.apache.spark.sql.types.LongType, "schema must widen to long")
    files1.foreach { rel =>
      val f = new java.io.File(s"$path/$rel")
      assert((f.length, f.lastModified) === sig(rel),
        s"widening must not rewrite $rel")
    }
    val got = ManifestTable.read(spark, path).select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 20)
    assert(got(3L) === 3L && got(15L) === 15000000000000L)
    // a NARROWER batch after the widening still lands and reads up
    ManifestTable.append(spark.range(20, 25).select(col("id"),
      col("id").cast("int").as("v")), path)                            // v3
    assert(ManifestTable.read(spark, path).filter(col("id") === 22)
      .select("v").head().getLong(0) === 22L)
    assert(ManifestTable.manifestSchema(spark, path, 3).get("v").dataType
      === org.apache.spark.sql.types.LongType)
    // incompatible retype still refuses
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark.range(0, 1).select(col("id"),
        lit("nope").as("v")), path)
    }
    // merge on the widened table: updates carry the WIDE type
    ManifestTable.merge(Seq((3L, -7L)).toDF("id", "v"), path, "id")
    assert(ManifestTable.read(spark, path).filter(col("id") === 3)
      .select("v").head().getLong(0) === -7L)
  }

  test("float→double widening; restore and CDC across the widening boundary") {
    val path = java.nio.file.Files.createTempDirectory("graft_tw2").toString + "/t"
    ManifestTable.write(spark.range(0, 5).select(col("id"),
      (col("id") + lit(0.5)).cast("float").as("x")), path)             // v1
    ManifestTable.append(spark.range(5, 10).select(col("id"),
      (col("id") + lit(0.25)).cast("double").as("x")), path)           // v2
    assert(ManifestTable.manifestSchema(spark, path, 2).get("x").dataType
      === org.apache.spark.sql.types.DoubleType)
    val got = ManifestTable.read(spark, path).select("id", "x")
      .as[(Long, Double)].collect().toMap
    assert(got(2L) === 2.5d && got(7L) === 7.25d)
    // time travel below the widening reads the narrow schema
    assert(ManifestTable.readVersion(spark, path, 1).schema("x").dataType
      === org.apache.spark.sql.types.FloatType)
    // the change feed replays the widening append in the WIDE schema
    val ch = ManifestTable.changesForVersion(spark, path, 2)
    assert(ch.schema("x").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(ch.count() === 5)
    // restore to the pre-widening version: schema narrows back with
    // the state; post-restore reads are float again
    ManifestTable.restore(spark, path, 1L)
    assert(ManifestTable.read(spark, path).schema("x").dataType ===
      org.apache.spark.sql.types.FloatType)
    assert(ManifestTable.read(spark, path).count() === 5)
  }
}
