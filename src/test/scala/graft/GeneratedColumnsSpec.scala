package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** GENERATED columns on manifest tables (Delta `GENERATED ALWAYS AS`):
  * computed when omitted, enforced when present, usable as partition
  * columns, and integrated with constraints, merge, rename/drop,
  * clone, and restore.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("omitted generated column is computed; present one is enforced") {
    val path = tmp("graft_gen1")
    ManifestTable.addGeneratedColumn(spark, path, "double_v", "v * 2")
    // omitted: computed
    ManifestTable.write(spark.range(0, 10).toDF("id")
      .withColumn("v", col("id") + 1), path)
    val got = ManifestTable.read(spark, path)
    assert(got.schema.fieldNames.toSet === Set("id", "v", "double_v"))
    assert(got.select("v", "double_v").as[(Long, Long)].collect()
      .forall { case (v, d) => d === v * 2 })
    // present and correct: accepted
    ManifestTable.append(Seq((100L, 5L, 10L)).toDF("id", "v", "double_v"), path)
    assert(ManifestTable.read(spark, path).count() === 11)
    // present and WRONG: the write job fails, nothing commits
    val before = ManifestTable.currentVersion(spark, path)
    intercept[Exception] {
      ManifestTable.append(Seq((101L, 5L, 11L)).toDF("id", "v", "double_v"), path)
    }
    assert(ManifestTable.currentVersion(spark, path) === before)
    assert(ManifestTable.generatedColumns(spark, path)
      === Map("double_v" -> "v * 2"))
  }

  test("generated PARTITION column: writers never materialize it, partition pruning works") {
    val path = tmp("graft_gen2")
    ManifestTable.addGeneratedColumn(spark, path, "bucket", "pmod(id, 4)")
    ManifestTable.write(spark.range(0, 400).toDF("id"), path,
      partitionCols = Seq("bucket"))
    val got = ManifestTable.read(spark, path)
    assert(got.count() === 400)
    assert(got.filter(col("bucket") === col("id") % 4).count() === 400)
    // partition-value prune on the generated column
    val (kept, total) = ManifestTable.pruneCount(spark, path, "bucket", 2.0, 2.0)
    assert(kept < total && kept >= 1,
      s"generated partition column must prune: $kept of $total")
  }

  test("merge enforces generated columns on upsert rows") {
    val path = tmp("graft_gen3")
    ManifestTable.addGeneratedColumn(spark, path, "double_v", "v * 2")
    ManifestTable.write(spark.range(0, 20).toDF("id")
      .withColumn("v", col("id")), path)
    // correct upsert passes
    ManifestTable.merge(Seq((3L, 50L, 100L)).toDF("id", "v", "double_v"),
      path, "id")
    assert(ManifestTable.read(spark, path)
      .filter(col("id") === 3).select("v").head().getLong(0) === 50L)
    // violating upsert fails before anything commits
    val before = ManifestTable.currentVersion(spark, path)
    intercept[Exception] {
      ManifestTable.merge(Seq((4L, 50L, 99L)).toDF("id", "v", "double_v"),
        path, "id")
    }
    assert(ManifestTable.currentVersion(spark, path) === before)
  }

  test("declaring on a non-empty table validates existing rows; divergence refuses") {
    val path = tmp("graft_gen4")
    ManifestTable.write(spark.range(0, 10).toDF("id")
      .withColumn("twice", col("id") * 2), path)
    // consistent: accepted, then enforced on the next append
    ManifestTable.addGeneratedColumn(spark, path, "twice", "id * 2")
    intercept[Exception] {
      ManifestTable.append(Seq((50L, 99L)).toDF("id", "twice"), path) }
    // divergent declaration refused
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addGeneratedColumn(spark, path, "id", "twice * 3") }
    assert(e.getMessage.contains("diverge"))
    // absent column on a non-empty table refused (no lazy backfill)
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.addGeneratedColumn(spark, path, "thrice", "id * 3") }
    assert(e2.getMessage.contains("lack"))
  }

  test("rename moves the declaration and REWRITES referencing expressions; referenced columns refuse drop; clone and restore carry it") {
    val path = tmp("graft_gen5")
    ManifestTable.addGeneratedColumn(spark, path, "double_v", "v * 2")
    ManifestTable.write(spark.range(0, 10).toDF("id")
      .withColumn("v", col("id")), path)
    // renaming the REFERENCED source column rewrites the declaration
    // in place (r11; was a refusal) — enforcement follows the new name
    ManifestTable.renameColumn(spark, path, "v", "w")
    assert(ManifestTable.generatedColumns(spark, path) ===
      Map("double_v" -> "w * 2"))
    ManifestTable.append(spark.range(20, 25).toDF("id")
      .withColumn("w", col("id")), path)
    assert(ManifestTable.read(spark, path)
      .filter(col("double_v") =!= col("w") * 2).count() === 0)
    // a VIOLATING append against the rewritten declaration still fails
    intercept[Exception] {
      ManifestTable.append(spark.range(0, 1).toDF("id")
        .withColumn("w", col("id")).withColumn("double_v", lit(999L)), path)
    }
    ManifestTable.renameColumn(spark, path, "w", "v") // back for the rest
    assert(ManifestTable.generatedColumns(spark, path) ===
      Map("double_v" -> "v * 2"))
    // dropping the referenced column still refuses (no expression can
    // survive losing its input)
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, path, "v") }
    // the generated column itself renames WITH its declaration
    ManifestTable.renameColumn(spark, path, "double_v", "dv")
    assert(ManifestTable.generatedColumns(spark, path) === Map("dv" -> "v * 2"))
    ManifestTable.append(spark.range(10, 15).toDF("id")
      .withColumn("v", col("id")), path)
    assert(ManifestTable.read(spark, path).filter(col("dv") =!= col("v") * 2)
      .count() === 0)
    // clone carries the declaration
    val dst = tmp("graft_gen5d")
    ManifestTable.cloneShallow(spark, path, dst)
    assert(ManifestTable.generatedColumns(spark, dst) === Map("dv" -> "v * 2"))
    // dropping the generated column removes the declaration; restore
    // brings both back
    val preDrop = ManifestTable.currentVersion(spark, path).get
    ManifestTable.dropColumn(spark, path, "dv")
    assert(ManifestTable.generatedColumns(spark, path) === Map.empty)
    ManifestTable.restore(spark, path, preDrop)
    assert(ManifestTable.generatedColumns(spark, path) === Map("dv" -> "v * 2"))
    // un-declaring keeps the column as an ordinary one
    ManifestTable.dropGeneratedColumn(spark, path, "dv")
    assert(ManifestTable.read(spark, path).schema.fieldNames.contains("dv"))
    assert(ManifestTable.generatedColumns(spark, path) === Map.empty)
  }
}
