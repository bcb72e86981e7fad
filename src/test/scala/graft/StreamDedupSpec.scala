package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamDedupSpec extends SparkSpec {

  test("streaming bronze ingest: AvailableNow drain equals the batch bronze, then compacts") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_bronze_src")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sfTiny/events.parquet"))
    val bronze = java.nio.file.Files.createTempDirectory("graft_bronze_out").toString + "/t"
    val batches = EventsStream.streamToBronze(spark, srcDir.toString, bronze)
    assert(batches >= 1)
    val streamed = spark.read.parquet(bronze)
    val expected = graft.ops.Relational.bronzeDerive(Tables.events(spark, sfTiny))
    assert(streamed.count() === expected.count())
    assert(streamed.select("event_id", "year", "month", "hour")
      .exceptAll(expected.select("event_id", "year", "month", "hour")).count() === 0)
    // re-running the ingest is idempotent: the stable default checkpoint
    // resumes from committed offsets, so nothing is re-drained into the
    // append sink (this was a duplication bug when every call got a
    // fresh temp checkpoint)
    EventsStream.streamToBronze(spark, srcDir.toString, bronze)
    assert(spark.read.parquet(bronze).count() === expected.count())
    // companion maintenance: compaction keeps the data identical
    graft.pipeline.Medallion.compact(spark, bronze + "/year=2024/month=1")
    assert(spark.read.parquet(bronze).count() === expected.count())
  }

  test("declared stream_dedup: a doubled (redelivered) feed emits each event exactly once") {
    val out = EventsStream.dedupEventsStream(spark, sfTiny)
    val expected = Tables.events(spark, sfTiny)
    assert(out.count() === expected.count(), "redelivered copies leaked through")
    assert(out.select("event_id").distinct().count() === expected.count())
  }

  test("stream-stream interval join equals the batch join on a finite replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_join")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sfTiny/events.parquet"))
    val raw = Tables.rawEventsSchema(spark, s"$sfTiny/events.parquet")
    val src = EventsStream.eventsSource(spark, dir.toString, raw)

    val q = EventsStream.viewToPurchase(src)
      .writeStream.format("memory").queryName("ss_join_test")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    import spark.implicits._
    val streamed = spark.table("ss_join_test")
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    val batch = EventsStream.viewToPurchase(
      Tables.events(spark, sfTiny).withColumn("ts", col("ts").cast(TimestampType)))
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("declared stream_view_purchase equals the batch interval join, timestamps included") {
    import spark.implicits._
    val declared = EventsStream.viewPurchaseStream(spark, sfTiny)
    assert(declared.schema.fieldNames === Array(
      "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts"))
    val e = Tables.events(spark, sfTiny)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val batch = v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
    assert(batch.count() > 0)
    assert(declared.exceptAll(batch).isEmpty && batch.exceptAll(declared).isEmpty)
  }

  test("declared stream_enrich: stateless stream-static join equals the batch dim join") {
    val declared = EventsStream.enrichEventsStream(spark, sfTiny)
    assert(declared.schema.fieldNames === Array(
      "event_id", "user_id", "c_name", "c_mktsegment", "event_type", "value"))
    val batch = EventsStream.enrichWithCustomer(
      Tables.events(spark, sfTiny), Tables.customer(spark, sfTiny))
    // stateless: every event must come through, exactly once
    assert(declared.count() === Tables.events(spark, sfTiny).count())
    assert(declared.exceptAll(batch).isEmpty && batch.exceptAll(declared).isEmpty)
    // the dim side must broadcast, never shuffle the stream
    val plan = EventsStream.enrichWithCustomer(
      Tables.events(spark, sfTiny), Tables.customer(spark, sfTiny))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), "dim join must broadcast")
  }

  test("streaming dedup collapses a twice-delivered stream to distinct events") {
    // two links to the same file = exact at-least-once redelivery
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    for (name <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(name), java.nio.file.Paths.get(s"$sfTiny/events.parquet"))

    val raw = Tables.rawEventsSchema(spark, s"$sfTiny/events.parquet")
    val src = EventsStream.eventsSource(spark, dir.toString, raw)

    val q = EventsStream.dedupStream(src)
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("dedup_stream_test")
    val expected = Tables.events(spark, sfTiny).count()
    assert(got.count() === expected)
    assert(got.select("event_id").distinct().count() === expected)
  }
}
