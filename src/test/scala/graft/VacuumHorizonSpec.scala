package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Vacuum-horizon races (round-15 verdict item #7): the two lifecycle
  * consumers that hold a version reference ACROSS time — a table-feed
  * subscription resuming from a checkpoint, and a deep clone copying
  * a pinned version's files — must fail LOUDLY when a concurrent
  * vacuum's floor passes their reference, and must be unaffected when
  * it doesn't.
  */
class VacuumHorizonSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def commitN(path: String, n: Int): Unit =
    (1 to n).foreach { i =>
      if (i == 1)
        ManifestTable.write(
          Seq((i.toLong, s"v$i")).toDF("id", "w"), path)
      else
        ManifestTable.append(
          Seq((i.toLong * 100, s"v$i")).toDF("id", "w"), path)
    }

  test("table feed: a resume offset below the vacuum floor refuses loudly (out of retention)") {
    val path = tmp("graft_vh1")
    commitN(path, 4)
    ManifestTable.vacuum(spark, path, keep = 2) // floor = version 3
    val src = new graft.streaming.TableFeedSource(spark, path)
    // a checkpointed consumer that last saw version 1 cannot replay
    // versions 2..: they are gone — silent re-delivery of the whole
    // table would double-count downstream state
    val e = intercept[IllegalArgumentException] {
      src.getBatch(
        Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(1L)),
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(4L))
    }
    assert(e.getMessage.contains("out of retention"), e.getMessage)
    // a resume INSIDE retention still replays (the batch plan builds;
    // counting it needs a streaming sink, which TableFeedSpec covers)
    val ok = src.getBatch(
      Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(3L)),
      org.apache.spark.sql.execution.streaming.runtime.LongOffset(4L))
    assert(ok.columns.contains("_commit_version"))
  }

  test("deep clone: a version swept by vacuum refuses before any copy; a retained version clones fine") {
    val root = java.nio.file.Files.createTempDirectory("graft_vh2").toString
    val path = s"$root/src"
    commitN(path, 4)
    ManifestTable.vacuum(spark, path, keep = 2)
    // version 1's manifest chain is gone: the clone refuses at state
    // resolution, before a single byte copies
    intercept[Exception] {
      ManifestTable.cloneDeep(spark, path, s"$root/dst1",
        version = Some(1L))
    }
    assert(ManifestTable.versions(spark, s"$root/dst1").isEmpty,
      "refused clone must not leave a committed version")
    // a RETAINED pinned version clones fine after the vacuum
    ManifestTable.cloneDeep(spark, path, s"$root/dst2",
      version = Some(3L))
    assert(ManifestTable.read(spark, s"$root/dst2").count() ===
      ManifestTable.readVersion(spark, path, 3L).count())
  }

  test("deep clone: a source data file vanishing MID-COPY fails loudly and commits nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_vh3").toString
    val path = s"$root/src"
    commitN(path, 2)
    // simulate the sweep landing between state resolution and the copy
    // job: drop one referenced data file directly (exactly what a
    // racing vacuum's dir delete does from a task's point of view)
    val v = ManifestTable.currentVersion(spark, path).get
    val rel = ManifestTable.manifestFiles(spark, path, v).head
    val victim = new java.io.File(path, rel)
    assert(victim.exists)
    assert(victim.delete())
    val e = intercept[Exception] {
      ManifestTable.cloneDeep(spark, path, s"$root/dst")
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert((e.getMessage != null &&
        e.getMessage.contains("race with VACUUM")) ||
      causes(e).exists(m => m != null && m.contains("race with VACUUM")),
      s"wanted the vacuum-race message, got: ${causes(e).mkString(" | ")}")
    assert(ManifestTable.versions(spark, s"$root/dst").isEmpty,
      "failed clone must not leave a committed version")
  }
}
