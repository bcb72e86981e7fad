package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** The declared stream-stream LEFT-outer join: drained replay must equal
  * the batch LEFT JOIN exactly — including the unmatched tail of the
  * replay, which round 5 silently dropped when the sentinel filter was
  * pushed below the watermark (see the scaladoc on
  * [[EventsStream.viewPurchaseLeftStream]]).
  */
class StreamLeftOuterSpec extends SparkSpec {

  private def batchLeftJoin(sfDir: String) = {
    val e = Tables.events(spark, sfDir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
        "left")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts").cast("timestamp_ntz").as("view_ts"),
        col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"))
  }

  test("declared stream_left_outer equals the batch LEFT JOIN, unmatched tail included") {
    val streamed = EventsStream.viewPurchaseLeftStream(spark, sfTiny)
    assert(streamed.schema.fieldNames === Array(
      "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts"))
    val batch = batchLeftJoin(sfTiny)
    val unmatched = batch.filter(col("purchase_id").isNull).count()
    assert(unmatched > 0, "fixture has no unmatched views - test is vacuous")
    assert(streamed.count() === batch.count(),
      "drained stream lost rows vs the batch LEFT JOIN (watermark drain incomplete?)")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the LAST view of the replay must be present (the round-5 failure
    // mode dropped exactly the final watermark-window of views)
    val lastView = Tables.events(spark, sfTiny)
      .filter(col("event_type") === "view")
      .agg(max(col("event_id"))).head.getLong(0)
    assert(streamed.filter(col("view_id") === lastView).count() >= 1,
      "tail view missing: watermark never drained past the end of the replay")
  }

  test("streaming declared queries restore the session confs they override") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    EventsStream.viewPurchaseLeftStream(spark, sfTiny).collect()
    assert(spark.conf.getOption(key) === before,
      s"$key leaked past viewPurchaseLeftStream")
    val shuffleBefore = spark.conf.get("spark.sql.shuffle.partitions")
    EventsStream.dedupEventsStream(spark, sfTiny).collect()
    assert(spark.conf.getOption(key) === before,
      s"$key leaked past dedupEventsStream")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === shuffleBefore)
  }
}
