package graft.streaming

import graft.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming restatement of the gold hourly-demand aggregate
  * (SURVEY §7.8): batch and stream share the aggregation definition, the
  * stream adds a watermark for bounded state.
  *
  * The parquet file source replays the fixture as a stream; in
  * production the same plan reads Kafka. State size is
  * O(open windows × event types), bounded by the 1-hour watermark —
  * this is what makes the aggregation runnable on an unbounded input,
  * where the batch groupBy could not be.
  */
object EventsStream {

  /** Shared aggregation: tumbling 1-hour windows per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        Det.dsum(col("value")).as("total_value"))

  /** Run `f` with a session conf temporarily overridden, restoring the
    * prior value (or unsetting) afterwards — the declared streaming
    * queries may pin `spark.sql.legacy.parquet.nanosAsLong` (needed
    * when the fixture generation is nanos-typed; harmless otherwise)
    * and must not leak it (or anything else) into the caller's session.
    */
  private[streaming] def withConf[T](spark: SparkSession, key: String,
                                     value: String)(f: => T): T = {
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Streaming source over an events directory. The file-stream source
    * needs a fixed schema, but the feed's `ts` physical type is not the
    * engine's to assume (fixture generations have shipped INT64 nanos
    * and TIMESTAMP(MICROS) — see [[graft.Tables.rawEventsSchema]]), so
    * the caller sniffs the footer once and this builder normalizes `ts`
    * to event-time TIMESTAMP for watermarks.
    */
  def eventsSource(spark: SparkSession, dir: String,
                   raw: StructType): DataFrame =
    spark.readStream.schema(raw).parquet(dir)
      .withColumn("ts", graft.Tables.tsToEventTime(raw("ts").dataType))

  /** Max event time of a parquet events file in epoch MICROS, whatever
    * the raw ts type — sentinel placement needs an absolute horizon.
    */
  private[graft] def maxEventMicros(spark: SparkSession, path: String): Long = {
    // schema served from the fixture-schema cache (no inference job)
    val df = spark.read.schema(graft.Tables.rawSchemaOf(spark, path))
      .parquet(path)
    df.schema("ts").dataType match {
      case LongType => df.agg(max(col("ts"))).head.getLong(0) / 1000L
      case _ => df.agg(max(unix_micros(col("ts").cast(TimestampType))))
        .head.getLong(0)
    }
  }

  /** Append end-of-stream sentinel rows (`us` = event time in epoch
    * MICROS) to a replay directory, written in the SAME physical `ts`
    * layout as the feed so the stream's fixed schema reads both files.
    */
  private[graft] def appendSentinels(spark: SparkSession, dir: String,
      raw: StructType,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val ts = raw("ts").dataType match {
      case LongType         => (col("us") * 1000L).as("ts") // micros → nanos-as-long
      case TimestampNTZType => timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")
      case _                => timestamp_micros(col("us")).as("ts")
    }
    df.select(col("event_id"), ts, col("user_id"), col("event_type"),
        col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** Streaming exact dedup: drop event_id duplicates arriving within the
    * watermark horizon. State is one key per event inside the watermark
    * window — bounded regardless of stream length (the unbounded-state
    * variant, plain `dropDuplicates`, is a leak on infinite streams).
    * At-least-once upstream delivery (Kafka redelivery, file re-listing)
    * becomes exactly-once downstream of this operator.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming ingest into the medallion bronze layer: micro-batches
    * append partitioned parquet via `foreachBatch` (which may use the
    * full batch writer — partitionBy, dynamic overwrite — that the
    * streaming sink API lacks). `Trigger.AvailableNow` drains what
    * exists and stops: the catch-up/backfill mode; drop the trigger for
    * continuous tailing. Appends accumulate small files —
    * `graft.pipeline.Medallion.compact` is the companion maintenance op.
    * Returns the number of micro-batches committed.
    *
    * `checkpointLocation` defaults to a sibling of the sink path, so
    * re-running the ingest resumes from committed offsets instead of
    * re-draining (and duplicating) the whole source — the append sink
    * makes a stable checkpoint the idempotence mechanism. The
    * checkpoint binds the (source, sink) pair: to ingest a DIFFERENT
    * srcDir into the same bronze table, pass a distinct checkpoint per
    * source; pass a fresh directory to force a full replay.
    */
  def streamToBronze(spark: SparkSession, srcDir: String, bronzePath: String,
                     checkpointLocation: String = null): Long = {
    val ckpt =
      if (checkpointLocation != null) checkpointLocation
      else bronzePath.stripSuffix("/") + "_ckpt"
    val raw = graft.Tables.rawEventsSchema(spark, srcDir)
    val src = spark.readStream.schema(raw).parquet(srcDir)
      .withColumn("ts", graft.Tables.tsToNtz(raw("ts").dataType))
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = graft.ops.Relational.bronzeDerive(src)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.partitionBy("year", "month").mode("append").parquet(bronzePath)
        batches.incrementAndGet(): Unit
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** Streaming ingest with a TRANSACTIONAL sink: every micro-batch
    * commits atomically through [[graft.pipeline.ManifestTable]] as a
    * tagged append. Two failure modes the plain append sink
    * ([[streamToBronze]]) cannot survive become safe:
    *  - a batch dying mid-write leaves only an uncommitted snapshot
    *    directory no reader ever sees (parquet append leaves partial
    *    files IN the table);
    *  - a REPLAYED batch no-ops against its already-committed tag.
    *    Structured Streaming checkpoints offsets AFTER foreachBatch
    *    returns, so a crash in that gap re-runs the last batch on
    *    restart — the standard at-least-once hole in every
    *    foreachBatch sink. The tag closes it: same batch id, same
    *    data, already committed, skip. (This is Delta's
    *    `txnAppId`/`txnVersion` idempotent-sink pattern without Delta;
    *    like it, it assumes the same checkpoint lineage — batch ids
    *    from a FRESH checkpoint number a different batching of the
    *    source and get no replay protection.)
    * Returns (batches committed, batches skipped as duplicates).
    */
  def streamToManifestBronze(spark: SparkSession, srcDir: String,
                             tablePath: String,
                             checkpointLocation: String = null): (Long, Long) = {
    val ckpt =
      if (checkpointLocation != null) checkpointLocation
      else tablePath.stripSuffix("/") + "_ckpt"
    val raw = graft.Tables.rawEventsSchema(spark, srcDir)
    val src = spark.readStream.schema(raw).parquet(srcDir)
      .withColumn("ts", graft.Tables.tsToNtz(raw("ts").dataType))
    val committed = new java.util.concurrent.atomic.AtomicLong(0)
    val skipped = new java.util.concurrent.atomic.AtomicLong(0)
    val q = graft.ops.Relational.bronzeDerive(src)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val tag = s"events-bronze-batch-$id"
          // one tag scan per batch, then a PLAIN append — calling
          // appendIdempotent after this check would pay the scan twice
          val before = graft.pipeline.ManifestTable
            .committedVersionOfTag(batch.sparkSession, tablePath, tag)
          if (before.isDefined) skipped.incrementAndGet()
          else {
            graft.pipeline.ManifestTable.append(batch, tablePath,
              tag = Some(tag))
            committed.incrementAndGet()
          }
        }: Unit
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    (committed.get(), skipped.get())
  }

  /** Declared NAMED-FORMAT sink query (round 12): the
    * [[streamToManifestBronze]] exactly-once ingest, driven through
    * `writeStream.format(GraftSinkProvider)` instead of a hand-rolled
    * foreachBatch — users get the transactional tagged-append contract
    * from the format string alone. The oracle is the BATCH bronze
    * derivation over the same events fixture: a hash match proves the
    * named sink lost, duplicated, and reordered nothing across its
    * micro-batch commits.
    */
  def streamSinkIngest(spark: SparkSession, sfDir: String): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sink_fmt")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val tablePath = streamDir.resolve("bronze_sink").toString
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val src = spark.readStream.schema(raw).parquet(streamDir.toString)
      .withColumn("ts", graft.Tables.tsToNtz(raw("ts").dataType))
    val q = graft.ops.Relational.bronzeDerive(src)
      .writeStream
      .format(classOf[GraftSinkProvider].getName)
      .option("path", tablePath)
      .option("tagPrefix", "bronze-sink")
      .option("checkpointLocation",
        streamDir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.pipeline.ManifestTable.read(spark, tablePath)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("year"), col("month"), col("day"), col("hour"))
      .orderBy(col("event_id"))
  }

  /** Streaming INCREMENTAL gold maintenance, exactly-once: each
    * micro-batch of order facts folds into the daily-revenue gold table
    * through [[graft.pipeline.Incremental]]'s exact mergeable state
    * (decimal sums + counts — merge ≡ full recompute bit-for-bit), and
    * each refreshed state commits ATOMICALLY as a new
    * [[graft.pipeline.ManifestTable]] version tagged with the batch id:
    *  - readers always see a complete, consistent gold table (and can
    *    time-travel to any previous refresh);
    *  - a replayed batch (crash between commit and offset checkpoint)
    *    hits its tag and no-ops — the delta is never double-merged,
    *    which would silently inflate every sum it touched;
    *  - history is never rescanned: each batch costs the delta + the
    *    (group-cardinality) state, the 100 TB refresh shape.
    * Returns (batches merged, batches skipped as replays).
    */
  def streamGoldDaily(spark: SparkSession, ordersDir: String,
                      statePath: String,
                      checkpointLocation: String = null): (Long, Long) =
    streamMergeableGold(spark, ordersDir, statePath, checkpointLocation,
      "gold-daily-batch",
      graft.pipeline.Incremental.dailyState,
      graft.pipeline.Incremental.mergeDailyState,
      Seq("o_custkey", "day"))

  /** The quantile twin: the SAME exactly-once refresh loop maintains the
    * mergeable histogram state
    * ([[graft.pipeline.Incremental.histogramState]]) — every mergeable
    * gold state gets streaming maintenance for free through
    * [[streamMergeableGold]]; percentile dashboards read
    * [[graft.ops.Sketches.quantilesFromState]] over the committed state.
    */
  def streamGoldQuantiles(spark: SparkSession, ordersDir: String,
                          statePath: String,
                          checkpointLocation: String = null): (Long, Long) =
    streamMergeableGold(spark, ordersDir, statePath, checkpointLocation,
      "gold-quantile-batch",
      graft.pipeline.Incremental.histogramState(_),
      graft.pipeline.Incremental.mergeHistogramState,
      Seq("day", "bin"))

  /** Shared exactly-once streaming maintenance of ANY associative
    * mergeable gold state: `stateOf` aggregates a fact micro-batch to
    * its delta state, `merge` folds it into the committed state, and
    * each refresh commits atomically under the batch's tag (replays
    * no-op — see the class doc on the at-least-once foreachBatch hole).
    */
  private def streamMergeableGold(spark: SparkSession, srcDir: String,
      statePath: String, checkpointLocation: String, tagPrefix: String,
      stateOf: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      keyCols: Seq[String]): (Long, Long) = {
    val ckpt =
      if (checkpointLocation != null) checkpointLocation
      else statePath.stripSuffix("/") + "_ckpt"
    // cached footer sniff (no per-call inference job)
    val schema = graft.Tables.rawSchemaOf(spark, srcDir)
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val merged = new java.util.concurrent.atomic.AtomicLong(0)
    val skipped = new java.util.concurrent.atomic.AtomicLong(0)
    val q = src.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val tag = s"$tagPrefix-$id"
          val sp = batch.sparkSession
          if (graft.pipeline.ManifestTable
              .committedVersionOfTag(sp, statePath, tag).isDefined)
            skipped.incrementAndGet()
          else {
            // keyed CoW state commit (round 12, shared with the feed
            // consumers): only state files holding touched groups
            // rewrite — O(changed groups) per batch, never O(state)
            TableFeedSource.commitStateDelta(sp, statePath,
              stateOf(batch), merge, lit(true), keyCols, tag)
            merged.incrementAndGet(): Unit
          }
        }: Unit
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    (merged.get(), skipped.get())
  }

  /** Stream-stream inner join: purchases correlated to a prior view by
    * the same user within one hour. Both sides carry watermarks and the
    * join condition bounds event-time distance — together they bound the
    * buffered state (each side holds ≤ watermark+interval of history);
    * without the interval condition a stream-stream join must buffer
    * one side forever.
    */
  def viewToPurchase(events: DataFrame,
                     joinType: String = "inner"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    views.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** Run the stream-stream view→purchase join over the fixture parquet
    * to completion (memory sink, append mode) and return the matches
    * with deterministic ordering. A stream-stream INNER join emits
    * exactly the batch interval-join result once the source drains —
    * watermarks only bound buffered state, they never drop inner
    * matches — so this declared query is oracle-checked against
    * DuckDB's batch self-join.
    */
  def viewPurchaseStream(spark: SparkSession, sfDir: String): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_vp")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val src = eventsSource(spark, streamDir.toString, raw)
    val qName = s"view_purchase_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try viewToPurchase(src).writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()
    // NTZ casts: the watermark columns are TIMESTAMP (session-UTC);
    // the oracle reads the parquet wallclock — same instants, NTZ type.
    // localCheckpoint + dropTempView releases the memory sink's pinned
    // copy of the full result.
    val out = spark.table(qName)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts").cast(TimestampNTZType).as("view_ts"),
        col("purchase_ts").cast(TimestampNTZType).as("purchase_ts"))
      .orderBy(col("view_id"), col("purchase_id"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Declared stream-stream LEFT-OUTER join: every view, with its
    * converting purchase where one exists within the hour, and NULL
    * purchase columns where none does — the "which impressions did NOT
    * convert" question the inner join cannot answer. Unmatched left
    * rows are emitted only once the watermark proves no match can
    * still arrive (state eviction time), so draining a finite replay
    * needs the watermark pushed past every view's match horizon: an
    * END-OF-STREAM SENTINEL pair (one far-future 'view' + one
    * far-future 'purchase' for a reserved user — BOTH sides' watermark
    * columns must advance, the join watermark is their min) triggers
    * the engine's final no-data micro-batch, which evicts and emits
    * every unmatched view. Same drain pattern as
    * [[Sessionize.sessionsStreamed]]; on an unbounded stream the
    * advancing watermark does this continuously. Once drained, the
    * output equals the batch LEFT JOIN exactly — the DuckDB oracle.
    *
    * PUSHDOWN TRAP (round-5 bug, caught by the oracle): the sentinel
    * filter must run AFTER the memory sink, never inside the streaming
    * plan. `user_id` is not the watermark column, so Catalyst pushes a
    * `user_id =!= sentinel` predicate below the EventTimeWatermark
    * operators and into the scan — the sentinel rows are gone before
    * they can advance the watermark, the final eviction batch never
    * covers the last watermark-window of views, and the tail of the
    * replay is silently missing from the output (8 rows at sf0.01).
    * [[Sessionize.sessionsStreamed]] is immune only because its filter
    * sits above `flatMapGroupsWithState`, which predicates cannot cross.
    */
  def viewPurchaseLeftStream(spark: SparkSession, sfDir: String): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_vpl")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val maxUs = maxEventMicros(spark, s"$sfDir/events.parquet")
    val SentinelUser = -1L
    // past max view_ts + 1 h (join interval) + 1 h (watermark delay),
    // with an hour of margin
    val sentinelUs = maxUs + 3L * 3600L * 1000000L
    appendSentinels(spark, streamDir.toString, raw,
      Seq((-1L, sentinelUs, SentinelUser, "view", 0.0, "{}"),
          (-2L, sentinelUs, SentinelUser, "purchase", 0.0, "{}")))
    val src = eventsSource(spark, streamDir.toString, raw)
    val qName = s"view_purchase_left_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try viewToPurchase(src, "leftOuter")
        .writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()
    // Sentinel rows are dropped HERE, on the drained batch result (see
    // scaladoc: an in-plan filter would be pushed below the watermark).
    // NULLS FIRST explicitly: the oracle compare is positional and
    // DuckDB's ASC default is NULLS LAST.
    val out = spark.table(qName)
      .filter(col("user_id") =!= SentinelUser)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts").cast(TimestampNTZType).as("view_ts"),
        col("purchase_ts").cast(TimestampNTZType).as("purchase_ts"))
      .orderBy(col("view_id"), col("purchase_id").asc_nulls_first)
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Declared streaming-dedup query: the source directory carries the
    * SAME events file twice (symlinked — the at-least-once redelivery a
    * Kafka rewind or file re-listing produces), and
    * [[dedupStream]]'s watermark-bounded `dropDuplicatesWithinWatermark`
    * must emit every event exactly once. Both copies are byte-identical,
    * so the output is deterministic whichever copy wins (and a
    * duplicate arriving behind the watermark is dropped as late data —
    * the same exactly-once outcome by the other path). Oracle = the
    * plain batch table: streaming dedup of a doubled feed ≡ the feed.
    */
  def dedupEventsStream(spark: SparkSession, sfDir: String): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_dd")
    for (copy <- Seq("events.parquet", "events_redelivered.parquet"))
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve(copy), java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val src = eventsSource(spark, streamDir.toString, raw)
    val qName = s"stream_dedup_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try dedupStream(src).writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()
    val out = spark.table(qName)
      .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Stream-static enrichment join — the streaming analog of the star
    * join and the remaining join class the engine declares: each event
    * picks up its customer dimension row. The static side is
    * `broadcast()` and the join is STATELESS — no watermark, no
    * buffered state, each micro-batch joins like a batch star join — so
    * it composes freely with downstream stateful stages. NOTE: Spark
    * re-evaluates the static side's plan (including the broadcast
    * exchange) on every micro-batch; callers that care about per-batch
    * rebuild cost persist() the dim first — the declared query does.
    */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("c_mktsegment"), col("event_type"), col("value"))

  /** Declared stream-static query: drain the fixture replay through
    * [[enrichWithCustomer]]; the drained append output equals the batch
    * join exactly (stateless — nothing is ever held back or evicted),
    * which is the DuckDB oracle.
    */
  def enrichEventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_enrich")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val src = eventsSource(spark, streamDir.toString, raw)
    // persisted: stream-static joins rebuild the static plan (and its
    // broadcast) per micro-batch; the cache makes that a memory read
    val dim = graft.Tables.customer(spark, sfDir).persist()
    val qName = s"enrich_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try enrichWithCustomer(src, dim).writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally { q.stop(); dim.unpersist(blocking = false) }
    val out = spark.table(qName)
      .orderBy(col("event_id"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Streaming windowed heavy hitters: per tumbling 1-hour window, the
    * top-`k` most active users by the [[graft.functions.MisraGries]]
    * sketch running INSIDE the streaming aggregation. The
    * `TypedImperativeAggregate` buffer is the state-store value, so each
    * open window holds ≤ `capacity` counters — a fixed few KB —
    * regardless of how many distinct users the window sees. The exact
    * alternative (`groupBy(window, user).count` + per-window rank)
    * keeps one state row per DISTINCT (window, user): unbounded on a
    * 100 TB stream and needing a second stateful rank stage the
    * streaming engine cannot append after an agg. The sketch gives the
    * standard MG guarantee per window (every user with > n/(capacity+1)
    * of the window's events survives, estimates are lower bounds) and
    * is EXACT whenever a window's distinct-user count stays ≤ capacity
    * — true for the fixtures at every declared SF, which is what makes
    * the query oracle-checkable (same contract as batch
    * `heavy_tokens`).
    *
    * Watermark-bounded: windows close and emit (append mode) once the
    * watermark passes their end; closed-window state is evicted.
    */
  def heavyUsersAgg(events: DataFrame, k: Int = 5,
                    capacity: Int = 4096): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.MisraGries.heavyHitters(
        SparkSession.active, col("user_id").cast(StringType),
        k, capacity).as("top"))

  /** Declared streaming heavy-hitters query: drain the fixture replay
    * through [[heavyUsersAgg]] and return (window_start, rank, user_id,
    * n_events) per hour window. Append mode emits each window exactly
    * once, on close; draining a finite replay therefore needs the
    * END-OF-STREAM SENTINEL (one far-future event pushing the watermark
    * past every real window's close — the [[viewPurchaseLeftStream]]
    * pattern). The sentinel's own window never closes (the watermark
    * trails its event time by the delay) so it never reaches the sink;
    * the post-sink window_start guard is belt-and-braces. No predicate
    * sits between source and watermark (the round-5 pushdown trap).
    *
    * Ties rank by user-id STRING ascending — the sketch's eval order —
    * and the oracle mirrors it (`ORDER BY n DESC, CAST(user_id AS
    * VARCHAR)`).
    */
  def heavyUsersStream(spark: SparkSession, sfDir: String): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_hh")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val maxUs = maxEventMicros(spark, s"$sfDir/events.parquet")
    // 1 h watermark delay + 1 h window + margin
    val sentinelUs = maxUs + 3L * 3600L * 1000000L
    appendSentinels(spark, streamDir.toString, raw,
      Seq((-1L, sentinelUs, -1L, "view", 0.0, "{}")))
    val src = eventsSource(spark, streamDir.toString, raw)
    val qName = s"heavy_users_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try heavyUsersAgg(src).writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()
    val out = spark.table(qName)
      // window.end <= sentinelUs excludes the sentinel's own window
      // UNCONDITIONALLY (its hour-truncated start is < sentinelUs except
      // when sentinelUs is hour-aligned, but its end is always > it),
      // while every real window ends <= maxUs + 1 h < sentinelUs.
      .filter(col("window.end") <= timestamp_micros(lit(sentinelUs)))
      .select(col("window.start").cast(TimestampNTZType).as("window_start"),
        posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("window_start"),
        (col("pos") + 1).cast(IntegerType).as("rank"),
        col("hit.token").cast(LongType).as("user_id"),
        col("hit.est").as("n_events"))
      .orderBy(col("window_start"), col("rank"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Streaming windowed value-HISTOGRAM aggregation: per tumbling
    * 1-hour window, per fixed-width value bin, an event count — the
    * streaming face of the mergeable quantile state
    * ([[graft.ops.Sketches.dailyValueHistogram]]). State is
    * (open windows × occupied bins) cells, bounded by the watermark and
    * the value range — percentiles over an unbounded stream with
    * bounded state, which no exact rank-based method can offer.
    */
  def hourlyValueHistAgg(events: DataFrame,
                         width: Double = 10.0): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"),
        floor(col("value") / lit(width)).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Declared streaming hourly quantiles: drain the fixture replay
    * through [[hourlyValueHistAgg]] in APPEND mode — each (window, bin)
    * cell is emitted exactly once when the watermark closes its window
    * and its state is EVICTED, so no query retains all-windows state —
    * then read p50/p95 per hour window off the drained histogram with
    * the SAME CDF selection as the batch gold rollup
    * ([[graft.ops.Sketches.quantilesFromBinned]]). The oracle recomputes
    * from the raw table, so a hash match proves the streaming histogram
    * (and every append-mode eviction) lost nothing.
    *
    * Draining a finite replay in append mode needs the END-OF-STREAM
    * SENTINEL (one far-future event pushing the watermark past every
    * real window's close — the [[heavyUsersStream]] pattern); the
    * sentinel's own window never closes, so it never reaches the sink,
    * and the post-sink window_start guard is belt-and-braces. On an
    * unbounded stream the advancing watermark does this continuously —
    * the declared artifact IS the production form.
    */
  def hourlyQuantilesStream(spark: SparkSession, sfDir: String,
                            width: Double = 10.0,
                            ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_hq")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val maxUs = maxEventMicros(spark, s"$sfDir/events.parquet")
    // 1 h watermark delay + 1 h window + margin
    val sentinelUs = maxUs + 3L * 3600L * 1000000L
    appendSentinels(spark, streamDir.toString, raw,
      Seq((-1L, sentinelUs, -1L, "view", 0.0, "{}")))
    val src = eventsSource(spark, streamDir.toString, raw)
    val qName = s"hourly_quantiles_${System.nanoTime()}"
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try hourlyValueHistAgg(src, width).writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()
    val binned = spark.table(qName)
      // window.end <= sentinelUs excludes the sentinel's own window
      // UNCONDITIONALLY (its hour-truncated start is < sentinelUs except
      // when sentinelUs is hour-aligned, but its end is always > it),
      // while every real window ends <= maxUs + 1 h < sentinelUs.
      .filter(col("window.end") <= timestamp_micros(lit(sentinelUs)))
      .select(col("window.start").cast(TimestampNTZType).as("window_start"),
        col("bin"), col("n"))
    val out = graft.ops.Sketches
      .quantilesFromBinned(binned, "window_start", width, ps,
        countName = "n_events")
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Run the streaming aggregation over the fixture parquet to
    * completion in APPEND mode — each (window, event_type) row is
    * emitted exactly once when the watermark closes its window and its
    * state is EVICTED, so state stays bounded at (open windows × types)
    * on an unbounded stream — and return the hour-of-day rollup that
    * matches the batch gold_hourly_demand key space.
    *
    * Draining a finite replay in append mode needs the END-OF-STREAM
    * SENTINEL (far-future event pushing the watermark past every real
    * window's close — the [[heavyUsersStream]] pattern); the sentinel's
    * own window never closes so it never reaches the sink; the
    * post-sink guard is belt-and-braces. The declared artifact IS the
    * production form.
    */
  def hourlyDemandStream(spark: SparkSession, sfDir: String): DataFrame =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true") {
    // TimestampType (not NTZ): watermarks require an event-time TIMESTAMP
    // column; with the session timezone pinned to UTC the wallclock values
    // match the batch NTZ reading exactly.
    // The file-stream source requires a directory; the fixture is a
    // single file. Expose it through a temp directory of symlinks (no
    // data copy) — in production this is just the table/topic directory.
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = graft.Tables.rawEventsSchema(spark, s"$sfDir/events.parquet")
    val maxUs = maxEventMicros(spark, s"$sfDir/events.parquet")
    // 1 h watermark delay + 1 h window + margin
    val sentinelUs = maxUs + 3L * 3600L * 1000000L
    appendSentinels(spark, streamDir.toString, raw,
      Seq((-1L, sentinelUs, -1L, "view", 0.0, "{}")))
    val src = eventsSource(spark, streamDir.toString, raw)

    val qName = s"hourly_demand_${System.nanoTime()}"
    // State-store partition count is fixed at query start from
    // spark.sql.shuffle.partitions. The state key space here is tiny
    // (event types × open windows), so a handful of stores suffices —
    // each store costs checkpoint I/O per micro-batch commit.
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try hourlyAgg(src).writeStream
        .format("memory")
        .queryName(qName)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    try q.processAllAvailable()
    finally q.stop()

    // Roll the closed tumbling windows up to hour-of-day so the result
    // is comparable with the batch gold_hourly_demand oracle; checkpoint
    // and drop the memory-sink view (it pins the full result in the
    // driver for the session's lifetime otherwise).
    val out = spark.table(qName)
      // window.end <= sentinelUs excludes the sentinel's own window
      // UNCONDITIONALLY (its hour-truncated start is < sentinelUs except
      // when sentinelUs is hour-aligned, but its end is always > it),
      // while every real window ends <= maxUs + 1 h < sentinelUs.
      .filter(col("window.end") <= timestamp_micros(lit(sentinelUs)))
      .groupBy(col("event_type"), hour(col("window.start")).as("hour"))
      .agg(
        sum(col("event_count")).as("event_count"),
        (sum(col("total_value").cast(Det.Dec)).cast(DoubleType) /
          sum(col("event_count"))).as("avg_value"))
      .orderBy(col("event_type"), col("hour"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }
}
