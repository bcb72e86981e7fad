package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessions: per-user sessions are disjoint, ordered, gap-consistent") {
    val s = Sessionize.sessions(spark, sfTiny).cache()
    assert(s.count() > 0)
    // within a session: duration ≥ 0; across sessions of one user:
    // the next session starts more than GapSeconds after the previous end
    val bad = s
      .withColumn("prev_end", lag(col("session_end"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_id")))
      .filter(col("prev_end").isNotNull &&
        unix_timestamp(col("session_start").cast(TimestampType)) -
          unix_timestamp(col("prev_end").cast(TimestampType)) <= Sessionize.GapSeconds)
      .count()
    assert(bad === 0)
    // event conservation: session n_events sums to the table size
    val total = s.agg(sum("n_events")).head.getLong(0)
    assert(total === Tables.events(spark, sfTiny).count())
    s.unpersist()
  }

  test("streaming flatMapGroupsWithState sessions equal batch sessions") {
    // replay the fixture through a file stream (symlink dir, no copy)
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"))
    val raw = Tables.rawEventsSchema(spark, s"$sfTiny/events.parquet")
    val src = graft.streaming.EventsStream.eventsSource(spark, dir.toString, raw)
    val q = Sessionize.sessionStream(spark, src)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("sess_test")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sessionize.sessions(spark, sfTiny)
      .select(col("user_id"),
        unix_micros(col("session_start").cast(TimestampType)),
        unix_micros(col("session_end").cast(TimestampType)),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    // every streamed (closed) session is a batch session; with the
    // final timeout batch the two sets coincide on this finite replay
    assert(streamed.subsetOf(batch),
      s"streamed-only: ${streamed.diff(batch).take(3)}")
    val coverage = streamed.size.toDouble / batch.size
    info(s"stream closed ${streamed.size}/${batch.size} sessions (coverage $coverage)")
    assert(coverage >= 0.9)
  }

  test("declared stream_sessionize equals batch sessions exactly (sentinel-closed)") {
    val streamed = Sessionize.sessionsStreamed(spark, sfTiny)
    assert(streamed.schema.fieldNames === Array(
      "user_id", "session_id", "session_start", "session_end", "n_events"))
    val batch = Sessionize.sessions(spark, sfTiny)
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "sentinel-closed streamed sessions diverge from batch")
    assert(streamed.count() === batch.count())
  }
}
