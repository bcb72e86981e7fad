package graft

import graft.pipeline.ManifestTable
import graft.streaming.GraftSinkProvider
import org.apache.spark.sql.functions._

/** Round-12 named streaming sink: `writeStream.format(GraftSinkProvider)`
  * commits each micro-batch as one transactional tagged append —
  * exactly-once without hand-rolled foreachBatch.
  */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def drainTo(srcDir: String, path: String, ckpt: String,
                      tagPrefix: String = "graft-sink"): Unit = {
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1) // several micro-batches
      .parquet(srcDir)
      .writeStream
      .format(classOf[GraftSinkProvider].getName)
      .option("path", path)
      .option("tagPrefix", tagPrefix)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("format sink: micro-batches land as tagged appends; restart replays nothing; content = batch read") {
    val root = java.nio.file.Files.createTempDirectory("graft_sink1").toString
    val srcDir = s"$root/src"
    val path = s"$root/t"
    val ckpt = s"$root/ckpt"
    // three source files → three micro-batches under maxFilesPerTrigger=1
    (0 until 3).foreach { i =>
      spark.range(i * 100, (i + 1) * 100).toDF("id")
        .withColumn("v", col("id") * 2)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    drainTo(srcDir, path, ckpt)
    val got = ManifestTable.read(spark, path).select("id", "v")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got.size === 300)
    assert(got === (0L until 300L).map(i => (i, i * 2)))
    val versions1 = ManifestTable.versions(spark, path)
    assert(versions1.size >= 2, "multiple micro-batches must commit " +
      s"as separate versions: $versions1")
    // a re-run over the SAME checkpoint replays nothing
    drainTo(srcDir, path, ckpt)
    assert(ManifestTable.read(spark, path).count() === 300)
    assert(ManifestTable.versions(spark, path) === versions1)
    // a FRESH checkpoint replays the batches — the txn tags no-op them
    drainTo(srcDir, path, s"$root/ckpt2")
    assert(ManifestTable.read(spark, path).count() === 300,
      "tagged appends must make redelivered batches no-ops")
    assert(ManifestTable.versions(spark, path) === versions1)
    // a different tagPrefix IS a different producer: rows append again
    drainTo(srcDir, path, s"$root/ckpt3", tagPrefix = "producer-b")
    assert(ManifestTable.read(spark, path).count() === 600)
    // append-only contract is enforced at sink construction
    val err = intercept[Exception] {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
        .parquet(srcDir)
        .groupBy("v").count()
        .writeStream
        .format(classOf[GraftSinkProvider].getName)
        .option("path", s"$root/t2")
        .option("checkpointLocation", s"$root/ckpt4")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(err.getMessage != null)
  }
}
