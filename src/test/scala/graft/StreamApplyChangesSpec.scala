package graft

import graft.pipeline.{ApplyChanges, ManifestTable}
import org.apache.spark.sql.functions._

/** Streaming APPLY CHANGES (round 18): the DLT verb consuming a CDC
  * STREAM — per-micro-batch idempotent applies, restart/replay
  * exactly-once, both SCD forms.
  */
class StreamApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("attr",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("seq",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("del",
      org.apache.spark.sql.types.BooleanType)))

  private def cdcStream(srcDir: String) =
    spark.readStream.schema(cdcSchema)
      .option("maxFilesPerTrigger", 1) // one event file per micro-batch
      .parquet(srcDir)

  private def writeEvents(srcDir: String,
                          rows: Seq[(Long, String, Long, Boolean)]): Unit =
    rows.toDF("id", "attr", "seq", "del")
      .coalesce(1).write.mode("append").parquet(srcDir)

  private def state(path: String): Seq[(Long, String, Long)] =
    ManifestTable.read(spark, path)
      .select(col("id"), col("attr"), col("_seq"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  test("streamScd1: micro-batches apply in order; same-checkpoint restart and fresh-checkpoint replay are both no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft_sac1").toString
    val src = s"$root/cdc"
    val dim = s"$root/dim"
    ApplyChanges.initializeScd1(
      Seq((1L, "a"), (2L, "b")).toDF("id", "attr"), dim, 0L)
    // batch 0: out-of-order updates for id=1 (7 wins) + delete id=2
    writeEvents(src, Seq(
      (1L, "a_stale", 3L, false), (1L, "a7", 7L, false),
      (2L, "b", 5L, true)))
    // batch 1: late event for id=1 (ignored), new key 9
    writeEvents(src, Seq(
      (1L, "a_late", 4L, false), (9L, "i", 6L, false)))
    def drain(ckpt: String): Unit = {
      val q = ApplyChanges.streamScd1(cdcStream(src), dim, "id",
        sequenceBy = "seq", deleteWhen = Some("del"),
        queryTag = "sac1", checkpoint = Some(ckpt))
      try q.processAllAvailable() finally q.stop()
    }
    drain(s"$root/ckpt")
    val want = Seq((1L, "a7", 7L), (9L, "i", 6L))
    assert(state(dim) === want)
    val versions = ManifestTable.versions(spark, dim)
    // same checkpoint: nothing re-delivers
    drain(s"$root/ckpt")
    assert(state(dim) === want)
    assert(ManifestTable.versions(spark, dim) === versions)
    // FRESH checkpoint: both batches re-deliver and the per-batch tags
    // no-op them — no resurrection of the deleted id=2, no double
    // anything
    drain(s"$root/ckpt2")
    assert(state(dim) === want,
      "redelivered batches must no-op on their idempotency tags")
    assert(ManifestTable.versions(spark, dim) === versions)
    // new events after the replay still apply (the tag space advances
    // with the batch ids of a live checkpoint)
    writeEvents(src, Seq((9L, "i2", 8L, false)))
    drain(s"$root/ckpt")
    assert(state(dim) === Seq((1L, "a7", 7L), (9L, "i2", 8L)))
  }

  test("streamScd2: validity-ranged history maintains across micro-batches; replay opens no duplicate versions") {
    val root = java.nio.file.Files.createTempDirectory("graft_sac2").toString
    val src = s"$root/cdc"
    val dim = s"$root/dim2"
    ApplyChanges.initializeScd2(
      Seq((1L, "a")).toDF("id", "attr"), dim, ts = 0L, seq0 = 0L)
    writeEvents(src, Seq((1L, "a2", 5L, false)))      // batch 0: change
    writeEvents(src, Seq((1L, "a_late", 2L, false)))  // batch 1: late — gated
    writeEvents(src, Seq((1L, "a2", 9L, true)))       // batch 2: delete
    def drain(ckpt: String): Unit = {
      val q = ApplyChanges.streamScd2(cdcStream(src), dim, "id",
        tracked = Seq("attr"), sequenceBy = "seq",
        deleteWhen = Some("del"), tsOf = b => b + 1,
        queryTag = "sac2", checkpoint = Some(ckpt))
      try q.processAllAvailable() finally q.stop()
    }
    drain(s"$root/ckpt")
    def hist() = ManifestTable.read(spark, dim)
      .select(col("id"), col("attr"), col("_valid_from"), col("_valid_to"))
      .as[(Long, String, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val want = Seq(
      (1L, "a", 0L, Some(1L)),   // closed by batch 0 (ts 1)
      (1L, "a2", 1L, Some(3L)))  // opened at ts 1, deleted at ts 3
    assert(hist() === want)
    // fresh-checkpoint replay: tags + the persisted sequence
    // high-water keep history byte-identical
    drain(s"$root/ckpt2")
    assert(hist() === want,
      "replayed SCD2 batches must not open duplicate versions")
  }
}
