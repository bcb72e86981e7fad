package graft.streaming

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** User sessionization over the `events` table — the canonical
  * custom-state streaming operator (gap-based sessions cannot be
  * expressed as a fixed tumbling window): events of one user belong to
  * one session while consecutive gaps stay under `GapSeconds`.
  *
  * Two implementations sharing one definition of "session":
  *
  *  - [[sessions]] (batch): lag/running-sum windows — one shuffle on
  *    user_id; this is the declared, DuckDB-oracle-checked query.
  *  - [[sessionStream]] (streaming): `flatMapGroupsWithState` with
  *    event-time timeout — per-user state is O(current session), closed
  *    sessions emit on watermark passage; unbounded input safe.
  *
  * Scale notes: batch shuffles each user's events once and the window
  * sort is per-user (bounded); streaming keeps only (start, end, count,
  * sum) per live user in the state store — not the events themselves.
  */
object Sessionize {

  val GapSeconds = 14400L // 4 h

  /** Integer epoch seconds of the (naive, UTC-pinned) event timestamp —
    * truncation matches the oracle's CAST(floor(epoch(ts)) AS BIGINT).
    */
  private def epochSec(c: org.apache.spark.sql.Column) =
    unix_timestamp(c.cast(TimestampType))

  /** Batch sessionization: session boundary where the per-user gap
    * exceeds GapSeconds; session_id = running count of boundaries.
    */
  def sessions(spark: SparkSession, sfDir: String): DataFrame =
    sessionsOf(Tables.events(spark, sfDir),
      "user_id", "ts", "event_id", "value", GapSeconds)
      .orderBy(col("user_id"), col("session_id"))

  /** DataFrame-first core: gap-based sessions over caller columns. */
  def sessionsOf(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCol: String, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val runs = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val es = epochSec(col(tsCol))
    val prev = lag(es, 1).over(byKey)
    val isNew = when(prev.isNull || es - prev > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(runs))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        Det.dsum(col(valueCol)).as("total_value"))
  }

  // ---- streaming path ----

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    /** Epoch MICROSECONDS — full session_start/end fidelity (both Spark
      * and DuckDB truncate the fixture's nano timestamps to micros, so
      * micros is exactly the oracle's precision).
      */
    def tsUs: Long = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
    /** Truncated seconds — the gap/timeout arithmetic, matching the
      * batch path's `unix_timestamp` truncation. */
    def tsSec: Long = ts.getTime / 1000L
  }
  case class SessionState(startUs: Long, endUs: Long, n: Long, sum: Double) {
    def endSec: Long = endUs / 1000000L
  }
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Long, total_value: Double)

  /** Per-user state transition: extend the open session with in-gap
    * events; emit + reset on a gap or on event-time timeout. Events may
    * arrive unordered within a micro-batch → sort the batch's slice
    * (bounded by batch size, not stream length). Emitted start/end are
    * epoch micros.
    */
  def updateUser(userId: Long, events: Iterator[Ev],
                 state: GroupState[SessionState]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = state.getOption.orNull
    for (e <- events.toSeq.sortBy(_.tsUs)) {
      cur match {
        case null =>
          cur = SessionState(e.tsUs, e.tsUs, 1L, e.value)
        case s if e.tsSec - s.endSec <= GapSeconds =>
          cur = SessionState(s.startUs, math.max(s.endUs, e.tsUs), s.n + 1, s.sum + e.value)
        case s =>
          out += Session(userId, s.startUs, s.endUs, s.n, s.sum)
          cur = SessionState(e.tsUs, e.tsUs, 1L, e.value)
      }
    }
    if (state.hasTimedOut) {
      // watermark passed the open session's horizon → close it
      state.getOption.foreach(s => out += Session(userId, s.startUs, s.endUs, s.n, s.sum))
      state.remove()
    } else if (cur != null) {
      state.update(cur)
      state.setTimeoutTimestamp(cur.endSec * 1000 + GapSeconds * 1000)
    }
    out.iterator
  }

  /** Streaming sessionization over an event stream with columns
    * (user_id, ts: timestamp, value). Emits closed sessions (append
    * mode). Watermark bounds both state and out-of-order tolerance.
    */
  def sessionStream(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    events
      .select(col("user_id"),
        col("ts").cast(TimestampType).as("ts"),
        col("value"))
      .withWatermark("ts", "1 hour")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUser)
  }

  /** Declared streaming twin of [[sessions]]: replay the fixture,
    * CLOSE every session, and emit the batch shape (minus total_value,
    * whose float accumulation order differs between the state machine
    * and the batch decimal sum — start/end/count are order-exact).
    *
    * Closing the tail sessions uses an END-OF-STREAM SENTINEL: the
    * watermark is global, so one synthetic event for a reserved user,
    * placed past every possible open session's timeout horizon
    * (max ts + gap + watermark delay + margin), advances the watermark
    * far enough that the engine's final no-data micro-batch fires
    * every event-time timeout. The sentinel's own session never closes
    * and is filtered out. This is the standard drain pattern for
    * proving a finite replay equals the batch computation; on an
    * unbounded stream the watermark does the same job continuously.
    */
  def sessionsStreamed(spark: SparkSession, sfDir: String): DataFrame =
    EventsStream.withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_sess")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val maxUs = EventsStream.maxEventMicros(spark, s"$sfDir/events.parquet")
    val SentinelUser = -1L
    val sentinelUs = maxUs + (GapSeconds + 3600L + 60L) * 1000000L
    EventsStream.appendSentinels(spark, streamDir.toString, raw,
      Seq((-1L, sentinelUs, SentinelUser, "sentinel", 0.0, "{}")))
    val src = EventsStream.eventsSource(spark, streamDir.toString, raw)
    val qName = s"sessions_stream_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try sessionStream(spark, src)
        .filter(col("user_id") =!= SentinelUser)
        .writeStream.format("memory").queryName(qName)
        .outputMode("append").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()
    // sessions of one user are disjoint → start order IS session order.
    // localCheckpoint materializes the result so the memory-sink view
    // (which pins the full output in the driver for the session's
    // lifetime) can be dropped immediately.
    val out = spark.table(qName)
      .withColumn("session_id", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start")))
        .cast(LongType))
      .select(col("user_id"), col("session_id"),
        timestamp_micros(col("session_start")).cast(TimestampNTZType)
          .as("session_start"),
        timestamp_micros(col("session_end")).cast(TimestampNTZType)
          .as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_id"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }
}
