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
    def tsSec: Long = ts.getTime / 1000L
  }
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Long, total_value: Double)

  /** Per-user state transition: extend the open session with in-gap
    * events; emit + reset on a gap or on event-time timeout. Events may
    * arrive unordered within a micro-batch → sort the batch's slice
    * (bounded by batch size, not stream length).
    */
  def updateUser(userId: Long, events: Iterator[Ev],
                 state: GroupState[SessionState]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = state.getOption.orNull
    for (e <- events.toSeq.sortBy(_.tsSec)) {
      cur match {
        case null =>
          cur = SessionState(e.tsSec, e.tsSec, 1L, e.value)
        case s if e.tsSec - s.end <= GapSeconds =>
          cur = SessionState(s.start, math.max(s.end, e.tsSec), s.n + 1, s.sum + e.value)
        case s =>
          out += Session(userId, s.start, s.end, s.n, s.sum)
          cur = SessionState(e.tsSec, e.tsSec, 1L, e.value)
      }
    }
    if (state.hasTimedOut) {
      // watermark passed the open session's horizon → close it
      state.getOption.foreach(s => out += Session(userId, s.start, s.end, s.n, s.sum))
      state.remove()
    } else if (cur != null) {
      state.update(cur)
      state.setTimeoutTimestamp(cur.end * 1000 + GapSeconds * 1000)
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
}
