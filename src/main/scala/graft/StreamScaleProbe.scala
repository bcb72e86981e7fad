package graft

import graft.streaming.{EventsStream, GraftSinkProvider, Sessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of [[ScaleProbe]]: replays the events feed at sf0.1
  * and at a synthesized `factor`× corpus through the three stateful
  * stream families and records what a cluster operator actually
  * capacity-plans on — input rows/sec and PEAK STATE ROWS
  * (`StreamingQueryProgress.stateOperators`), at both scales, with
  * ratios. The batch probe proves the plans stay ~linear; this one
  * proves the STATE stays bounded by what the watermark/keys imply:
  *
  *  - `stream_hourly_demand` (windowed agg): state = open windows ×
  *    event types — INDEPENDENT of input volume; the 10× replay must
  *    show a ~1× state ratio (10× rows through the same cells).
  *  - `stream_dedup` (dropDuplicatesWithinWatermark): state = event
  *    keys inside the watermark horizon — scales with arrival RATE
  *    (~10× here, where the replay compresses 10× rows into the same
  *    event-time span), never with stream length.
  *  - `stream_sessionize` (flatMapGroupsWithState): state = one
  *    (start, end, n, sum) record per LIVE USER — scales with the
  *    key space (~10× disjoint users here), never with events.
  *
  * The `factor`× events corpus is derived like the batch probe's
  * tables: replica k shifts event_id and user_id into disjoint ranges,
  * keeps ts/type/value — so window structure is preserved (the ~1×
  * claim is testable) while dedup keys and user keys genuinely
  * multiply. Sinks are `noop`: the probe times the stateful operators,
  * not a memory sink's driver copy.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamScaleProbe
  *   /root/testdata/sf0.1 /tmp/graft_sf1_stream [factor]"
  * One JSON line per (query, scale) pair + a ratio line; results table
  * lives in SCALE.md.
  */
object StreamScaleProbe {

  final case class Probe(sec: Double, inputRows: Long, peakStateRows: Long) {
    def rowsPerSec: Double = if (sec > 0) inputRows / sec else Double.NaN
  }

  /** Drain `plan(src)` over a replay of `eventsPath` with a noop sink;
    * report wall, input rows, peak state rows. `sentinel` appends the
    * end-of-stream row that append-mode aggregations need to flush
    * (and evict) every real window/session.
    */
  def probe(spark: SparkSession, eventsPath: String,
            plan: DataFrame => DataFrame, sentinel: Boolean): Probe = {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sprobe")
    // the file-stream source lists FILES in its directory (it does not
    // recurse through a directory symlink): a single-file fixture links
    // as-is, a multi-file corpus links part file by part file
    val src0 = java.nio.file.Paths.get(eventsPath)
    if (java.nio.file.Files.isDirectory(src0)) {
      java.nio.file.Files.list(src0).forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.createSymbolicLink(
            streamDir.resolve(p.getFileName.toString), p)
      }
    } else
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"), src0)
    val raw = Tables.rawEventsSchema(spark, eventsPath)
    if (sentinel) {
      val maxUs = EventsStream.maxEventMicros(spark, eventsPath)
      // past every window close AND session timeout horizon
      val sentinelUs = maxUs +
        (Sessionize.GapSeconds + 2L * 3600L + 60L) * 1000000L
      EventsStream.appendSentinels(spark, streamDir.toString, raw,
        Seq((-1L, sentinelUs, -1L, "sentinel", 0.0, "{}")))
    }
    val src = EventsStream.eventsSource(spark, streamDir.toString, raw)
    // `recentProgress` is a RING BUFFER capped at
    // spark.sql.streaming.numRecentProgressUpdates (default 100): a drain
    // with more micro-batches would undercount input rows and could miss
    // the true state peak. A listener sees EVERY progress event, so the
    // rows/sec and peak-state numbers SCALE.md records are exact
    // regardless of batch count.
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val peakStateRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val terminated = new java.util.concurrent.CountDownLatch(1)
    // One probe query runs at a time and the listener lives only for this
    // call, so no id filter is needed (filtering on q.id would race the
    // first micro-batch against `start()` returning).
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        inputRows.addAndGet(e.progress.numInputRows)
        val state = e.progress.stateOperators.map(_.numRowsTotal).sum
        peakStateRows.accumulateAndGet(state, math.max(_, _))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        terminated.countDown()
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val q = plan(src).writeStream.format("noop").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    // listener delivery is async but ORDERED: the terminated event landing
    // means every progress event before it has been delivered, so the
    // accumulators are complete once the latch opens
    terminated.await(30, java.util.concurrent.TimeUnit.SECONDS)
    spark.streams.removeListener(listener)
    Probe(sec, inputRows.get(), peakStateRows.get())
  }

  /** `stream_sink_ingest` contract probe: per-BATCH sink cost must
    * stay FLAT as the target table grows — each micro-batch is one
    * tag lookup (O(recent manifests), driver metadata) plus one
    * O(new files) append commit, nothing scaling with table size.
    * Drives the REAL [[GraftSinkProvider]] over a
    * `maxFilesPerTrigger=1` replay of an N-way split corpus, so batch
    * k appends onto a table already holding k−1 batches; reports the
    * mean batch seconds of the first vs second half (flatness ratio)
    * and total rows.
    */
  def sinkProbe(spark: SparkSession, eventsPath: String,
                splits: Int): (Double, Double, Long) = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft_sinkprobe")
    val feedDir = s"$root/feed"
    val table = s"$root/table"
    val raw = Tables.rawEventsSchema(spark, eventsPath)
    spark.read.schema(raw).parquet(eventsPath)
      .repartition(splits).write.parquet(feedDir)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          batches.add((e.progress.numInputRows,
            Option(e.progress.durationMs.get("triggerExecution"))
              .map(_.toDouble / 1000.0).getOrElse(0.0))): Unit
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q = spark.readStream.schema(raw)
      .option("maxFilesPerTrigger", "1").parquet(feedDir)
      .writeStream
      .format(classOf[GraftSinkProvider].getName)
      .option("path", table)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try q.processAllAvailable()
    finally { q.stop(); spark.streams.removeListener(listener) }
    val seq = batches.asScala.toSeq
    val secs = seq.map(_._2)
    val half = math.max(1, secs.size / 2)
    val firstMean = secs.take(half).sum / half
    val secondMean = secs.drop(secs.size - half).sum / half
    (firstMean, secondMean, seq.map(_._1).sum)
  }

  /** r13: startingVersion flatness probe — the 100 TB claim behind
    * `option("startingVersion", n)` is that a FRESH subscriber joins
    * the feed WITHOUT paying the bootstrap: drain cost must be flat
    * in the size of the skipped history (v1 = `hist`× orders here)
    * and linear only in the delivered tail (v2/v3, fixed slices).
    * Sink is foreachBatch-count (the memory sink's driver copy would
    * measure the harness, not the source — the reason the batch
    * ScaleProbe cannot run the declared memory-sink query at 100×).
    * Returns (drain seconds, delivered rows) — timing starts AFTER
    * the table is built.
    */
  def feedFromProbe(spark: SparkSession, baseDir: String,
                    hist: Int): (Double, Long) = {
    import graft.pipeline.ManifestTable
    val root = java.nio.file.Files.createTempDirectory("graft_feedfrom")
    val table = s"$root/t"
    val ord = Tables.orders(spark, baseDir)
    val v1 = (0 until hist).map { k =>
      ord.withColumn("o_orderkey",
        col("o_orderkey") + lit(k.toLong * 1000000000L))
    }.reduce(_ unionByName _)
    ManifestTable.write(v1, table)                                   // v1
    val tail = ord.filter(col("o_orderkey") % 101 === 0)
    ManifestTable.append(                                            // v2
      tail.withColumn("o_orderkey", -col("o_orderkey") - 1L), table)
    ManifestTable.append(                                            // v3
      tail.withColumn("o_orderkey",
        -col("o_orderkey") - 1000000000L), table)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val q = spark.readStream
      .format(classOf[graft.streaming.TableFeedProvider].getName)
      .option("path", table)
      .option("startingVersion", "2")
      .load()
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) => rows.addAndGet(b.count()): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    ((System.nanoTime() - t0) / 1e9, rows.get())
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val probeDir = if (args.length > 1) args(1) else "/tmp/graft_sf1_stream"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-scale-probe")
      // state-store count is fixed at query start; 8 stores match the
      // declared queries' setting so state metrics are comparable
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a feed-probe-only run never touches the events corpus — skip the
    // (possibly factor-mismatched) regeneration entirely
    val needsEvents = sys.env.get("SPARK_GRAFT_QUERIES")
      .forall(_.split(",").map(_.trim)
        .exists(q => q.nonEmpty && q != "stream_feed_from"))

    // ---- scaled events corpus (idempotent, ScaleProbe discipline) ----
    val eventsOut = s"$probeDir/events.parquet"
    val factorFile = java.nio.file.Paths.get(s"$probeDir/_factor")
    val recorded =
      try java.nio.file.Files.readString(factorFile).trim.toInt
      catch { case _: Throwable => -1 }
    if (needsEvents && (recorded != factor ||
        !new java.io.File(s"$eventsOut/_SUCCESS").exists())) {
      java.nio.file.Files.createDirectories(factorFile.getParent)
      java.nio.file.Files.deleteIfExists(factorFile)
      val ev = spark.read.parquet(s"$baseDir/events.parquet")
      // disjoint key ranges per replica; ts/type/value unchanged →
      // same window structure, multiplied dedup keys and users
      val scaled = (0 until factor).map { k =>
        ev.withColumn("event_id", col("event_id") + lit(k.toLong * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(k.toLong * 1000000000L))
      }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(eventsOut)
      java.nio.file.Files.writeString(factorFile, factor.toString)
    }

    // Dev-only subset filter (the Bench/Verify/ScaleProbe convention)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))

    val plans: Seq[(String, DataFrame => DataFrame, Boolean)] = Seq(
      ("stream_hourly_demand",
        (src: DataFrame) => EventsStream.hourlyAgg(src), true),
      ("stream_dedup",
        (src: DataFrame) => EventsStream.dedupStream(src), false),
      ("stream_sessionize",
        (src: DataFrame) => Sessionize.sessionStream(spark, src)
          .filter(col("user_id") =!= -1L).toDF(), true))
      .filter(p => selected(p._1))

    // warm-up: JIT/codegen the streaming runtime once, untimed
    plans.foreach { case (_, plan, s) =>
      try probe(spark, s"$baseDir/events.parquet", plan, s)
      catch { case _: Throwable => () }
    }

    plans.foreach { case (name, plan, sentinel) =>
      val p1 = probe(spark, s"$baseDir/events.parquet", plan, sentinel)
      val p2 = probe(spark, eventsOut, plan, sentinel)
      def r(a: Double, b: Double) = if (a > 0) b / a else Double.NaN
      println(f"""{"query":"$name","sf01_sec":${p1.sec}%.2f,"sf1_sec":${p2.sec}%.2f,"sf01_rows_sec":${p1.rowsPerSec}%.0f,"sf1_rows_sec":${p2.rowsPerSec}%.0f,"sf01_peak_state":${p1.peakStateRows},"sf1_peak_state":${p2.peakStateRows},"state_ratio":${r(p1.peakStateRows.toDouble, p2.peakStateRows.toDouble)}%.2f,"sec_ratio":${r(p1.sec, p2.sec)}%.2f}""")
    }

    // r13: stream_sink_ingest flatness probe — 16 single-file batches,
    // per-batch cost must not grow with the accumulated table
    if (selected("stream_sink_ingest"))
      Seq("sf01" -> s"$baseDir/events.parquet", "sfX" -> eventsOut)
        .foreach { case (label, path) =>
          val (first, second, rows) = sinkProbe(spark, path, splits = 16)
          val flat = if (first > 0) second / first else Double.NaN
          println(f"""{"query":"stream_sink_ingest","scale":"$label","rows":$rows,"first_half_batch_sec":$first%.3f,"second_half_batch_sec":$second%.3f,"flatness_ratio":$flat%.2f}""")
        }
    // r13: startingVersion flatness — drain cost flat in the skipped
    // bootstrap's size (delivered tail fixed), warm run first untimed
    if (selected("stream_feed_from")) {
      try feedFromProbe(spark, baseDir, 1) catch { case _: Throwable => () }
      Seq(1, factor).foreach { hist =>
        val (sec, rows) = feedFromProbe(spark, baseDir, hist)
        println(f"""{"query":"stream_feed_from","hist_factor":$hist,"drain_sec":$sec%.2f,"delivered_rows":$rows}""")
      }
    }
    spark.stop()
  }
}
