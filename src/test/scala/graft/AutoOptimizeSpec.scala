package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Write-time small-file control (round-16): the
  * `graft.autoOptimize.optimizeWrite` property coalesces every staged
  * batch toward the target file size, and
  * `graft.autoOptimize.autoCompact` bin-packs accumulated small files
  * post-commit — ONLY the small ones, so large files never rewrite.
  * This is the knob pair a 100 TB streaming ingest needs: without it
  * a micro-batch sink commits one sliver per shuffle partition per
  * batch and defers all small-file pressure to manual OPTIMIZE.
  */
class AutoOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def liveFiles(path: String): Seq[String] =
    ManifestTable.currentVersion(spark, path)
      .map(v => ManifestTable.resolveState(spark, path, v).files)
      .getOrElse(Nil)

  private def fileCount(path: String): Int = liveFiles(path).size

  test("optimizeWrite coalesces a many-partition batch into one file") {
    val path = tmp("graft_ow")
    ManifestTable.write((1L to 10L).toDF("id"), path)
    ManifestTable.setProperties(spark, path,
      Map("graft.autoOptimize.optimizeWrite" -> "true"))
    // a 16-partition sliver batch: without the property this appends
    // 16 files; with it the estimate (~KB) is far under the 128 MB
    // target, so the batch stages as ONE file
    val before = fileCount(path)
    ManifestTable.append(
      (11L to 100L).toDF("id").repartition(16), path)
    val after = fileCount(path)
    assert(after - before === 1,
      s"optimizeWrite must stage one file, got ${after - before}")
    // data intact
    assert(ManifestTable.read(spark, path).count() === 100L)
    // control: same batch shape without the property appends many
    val p2 = tmp("graft_ow2")
    ManifestTable.write((1L to 10L).toDF("id"), p2)
    val b2 = fileCount(p2)
    ManifestTable.append((11L to 100L).toDF("id").repartition(16), p2)
    assert(fileCount(p2) - b2 > 1, "control append should not coalesce")
  }

  test("optimizeWrite honors a custom targetFileSize") {
    val path = tmp("graft_owt")
    ManifestTable.write((1L to 10L).toDF("id"), path)
    ManifestTable.setProperties(spark, path, Map(
      "graft.autoOptimize.optimizeWrite" -> "true",
      // absurdly small target: the estimate exceeds it, so the batch
      // keeps (up to) its incoming partitioning instead of collapsing
      "graft.autoOptimize.targetFileSize" -> "16"))
    val before = fileCount(path)
    ManifestTable.append((11L to 5000L).toDF("id").repartition(4), path)
    assert(fileCount(path) - before === 4,
      "a tiny target must keep the batch's write parallelism")
  }

  test("autoCompact bin-packs small files post-commit, carries big ones") {
    val path = tmp("graft_ac")
    // one BIG file (above half the 1 MB target): must never rewrite
    ManifestTable.write(
      (1L to 200000L).map(i => (i, s"payload-$i-" + "x" * 40))
        .toDF("id", "w").coalesce(1),
      path)
    val bigRefs = liveFiles(path)
    assert(bigRefs.size === 1)
    ManifestTable.setProperties(spark, path, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.targetFileSize" -> (1L << 20).toString,
      "graft.autoCompact.minNumFiles" -> "5"))
    // four sliver appends: below the trigger, nothing compacts
    (1 to 4).foreach { i =>
      ManifestTable.append(
        Seq((1000000L + i, s"s$i")).toDF("id", "w"), path)
    }
    assert(fileCount(path) === 5, "below minNumFiles: no compaction")
    // the fifth sliver crosses minNumFiles=5 smalls -> auto-compact
    ManifestTable.append(Seq((1000005L, "s5")).toDF("id", "w"), path)
    val afterFiles = liveFiles(path)
    assert(afterFiles.size === 2,
      s"expected big + one packed file, got ${afterFiles.size}")
    assert(afterFiles.contains(bigRefs.head),
      "the big file must carry VERBATIM through auto-compaction")
    // the compaction is its own commit with op COMPACT
    val hist = ManifestTable.history(spark, path)
      .select("operation").as[String].collect().toSeq
    assert(hist.contains("COMPACT"), s"history: $hist")
    // data intact through the compaction
    assert(ManifestTable.read(spark, path).count() === 200005L)
    assert(ManifestTable.read(spark, path)
      .filter($"id" > 1000000L).count() === 5L)
  }

  test("streaming sink inherits optimizeWrite: one file per micro-batch, not one per partition") {
    val root = java.nio.file.Files.createTempDirectory("graft_ows").toString
    val srcDir = s"$root/src"
    val path = s"$root/t"
    (0 until 3).foreach { i =>
      spark.range(i * 100, (i + 1) * 100).toDF("id")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    ManifestTable.write((-1L to -1L).toDF("id"), path)
    ManifestTable.setProperties(spark, path,
      Map("graft.autoOptimize.optimizeWrite" -> "true"))
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .repartition(8) // sliver batches that would stage 8 files each
      .writeStream
      .format(classOf[graft.streaming.GraftSinkProvider].getName)
      .option("path", path)
      .option("tagPrefix", "ows")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 1 (initial) + 3 micro-batches × 1 coalesced file each
    assert(fileCount(path) === 4,
      s"sink batches must stage one file each, got ${fileCount(path)}")
    assert(ManifestTable.read(spark, path).count() === 301L)
  }

  test("autoCompact racing concurrent ingest never loses or duplicates rows") {
    val path = tmp("graft_acr")
    ManifestTable.write(Seq(0L).toDF("id"), path)
    ManifestTable.setProperties(spark, path, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.targetFileSize" -> (1L << 20).toString,
      "graft.autoCompact.minNumFiles" -> "3"))
    // two appenders storm the table; every append past the threshold
    // ALSO fires a best-effort compaction, so compactions race both
    // the sibling's appends and the sibling's compactions
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val fs = (0 until 2).map { w =>
      Future {
        (1 to 8).foreach { i =>
          ManifestTable.append(
            Seq(w * 1000L + i).toDF("id"), path, maxAttempts = 30)
        }
      }(ec)
    }
    try fs.foreach(Await.result(_, 180.seconds))
    finally pool.shutdown()
    val got = ManifestTable.read(spark, path).as[Long]
      .collect().sorted.toSeq
    val want = (Seq(0L) ++ (1 to 8).flatMap(i =>
      Seq(i.toLong, 1000L + i))).sorted
    assert(got === want,
      s"rows lost/duplicated under compaction races: got ${got.size}")
    assert(fileCount(path) < 17, "compactions must have engaged")
  }

  test("autoCompact is best-effort and converges (no re-trigger loop)") {
    val path = tmp("graft_ac2")
    ManifestTable.write((1L to 10L).toDF("id"), path)
    ManifestTable.setProperties(spark, path, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.targetFileSize" -> (1L << 20).toString,
      "graft.autoCompact.minNumFiles" -> "3"))
    (1 to 10).foreach(i =>
      ManifestTable.append(Seq(100L + i).toDF("id"), path))
    // every trigger compacts to ONE small file, which alone can never
    // reach minNumFiles again — the table stays near-compact forever
    assert(fileCount(path) <= 3, s"files: ${fileCount(path)}")
    assert(ManifestTable.read(spark, path).count() === 20L)
  }
}
