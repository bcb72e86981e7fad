package graft

import graft.pipeline.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("batch observe: metrics ride the existing pass and match direct aggregation") {
    val events = Tables.events(spark, sfTiny)
    val (observed, obs) = Quality.observedEvents(events)
    // the metrics piggyback on an unrelated downstream job
    val bronzeRows = graft.ops.Relational.bronzeDerive(observed).count()
    val m = obs.get
    assert(m("rows") === bronzeRows)
    assert(m("bad_value_rows").asInstanceOf[Long] ===
      events.filter(col("value").isNull || col("value") < 0).count())
    assert(m("null_key_rows") === 0L)
    // event-time bounds present and ordered (the 1970-collapse monitor)
    val (lo, hi) = (m("min_ts"), m("max_ts"))
    assert(lo != null && hi != null && lo.toString <= hi.toString)
  }

  test("streaming observe: per-batch metrics arrive in query progress") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quality_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"))
    val raw = Tables.rawEventsSchema(spark, s"$sfTiny/events.parquet")
    val src = graft.streaming.EventsStream.eventsSource(spark, dir.toString, raw)
    val qName = s"quality_${System.nanoTime()}"
    val q = Quality.observedEventsStream(src)
      .writeStream.format("memory").queryName(qName)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.catalog.dropTempView(qName)
    val batches = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("bronze_quality")))
    assert(batches.nonEmpty, "no observed metrics in any progress")
    val total = batches.map(_.getAs[Long]("rows")).sum
    assert(total === Tables.events(spark, sfTiny).count())
    assert(batches.map(_.getAs[Long]("null_key_rows")).sum === 0L)
  }
}
