package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamHeavyUsersSpec extends SparkSpec {

  test("declared stream_heavy_users equals the exact batch per-window top-k") {
    // exact regime: distinct users per window << capacity, so the MG
    // counts are exact and the stream must reproduce the batch rank
    val out = EventsStream.heavyUsersStream(spark, sfTiny)
      .collect().map(_.toString).toSeq
    val w = Window.partitionBy(col("w"))
      .orderBy(col("n").desc, col("user_id").cast(StringType))
    val batch = Tables.events(spark, sfTiny)
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("w").cast(TimestampNTZType).as("window_start"),
        col("rank").cast(IntegerType).as("rank"), col("user_id"),
        col("n").as("n_events"))
      .orderBy(col("window_start"), col("rank"))
      .collect().map(_.toString).toSeq
    assert(out === batch)
  }

  test("sketch regime: a true heavy hitter survives capacity overflow with the MG bound") {
    // one window, 1 heavy user (600 events) + 300 one-event users,
    // capacity 64 << 301 distinct: decrements MUST happen, and MG still
    // guarantees the heavy user surfaces with est >= true - n/(cap+1)
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_skew")
    val base = 1700000000000000000L // aligned enough: any fixed nanos
    import spark.implicits._
    val rows =
      (1 to 600).map(i => (i.toLong, base + i * 1000000L, 7L, "view", 0.0, "{}")) ++
      (1 to 300).map(i => ((1000 + i).toLong, base + i * 1000000L,
        (100 + i).toLong, "view", 0.0, "{}")) ++
      // far-future sentinel drains the watermark (append-mode eviction)
      Seq((9999L, base + 4L * 3600L * 1000000000L, -1L, "view", 0.0, "{}"))
    // write INTO the streamed dir: the file source lists top-level
    // files only (the fixture's events.parquet is a single file)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/feed")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val src = spark.readStream.schema(schema).parquet(s"$dir/feed")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val qName = "hh_skew_test"
    val q = EventsStream.heavyUsersAgg(src, k = 1, capacity = 64)
      .writeStream.format("memory").queryName(qName)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val emitted = spark.table(qName)
      .select(explode(col("top")).as("hit"))
      .select(col("hit.token"), col("hit.est"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    spark.catalog.dropTempView(qName)
    // the real window emitted (sentinel's own window never closes)
    assert(emitted.length === 1, s"expected one drained window: ${emitted.toSeq}")
    val (tok, est) = emitted.head
    assert(tok === "7", "the heavy user must survive the sketch")
    val slack = 900L / (64L + 1L) // n/(capacity+1)
    assert(est >= 600L - slack && est <= 600L,
      s"MG lower-bound violated: est=$est")
  }
}
