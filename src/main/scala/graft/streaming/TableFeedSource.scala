package graft.streaming

import graft.pipeline.ManifestTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** [[ManifestTable]] as a Structured Streaming SOURCE — the
  * table-as-stream / change-feed subscription that closes the CDC loop
  * [[ManifestTable.diff]] opens: a downstream incremental pipeline
  * subscribes to a committed table and receives each new VERSION as one
  * micro-batch of row-level changes, exactly once, resumable from a
  * checkpoint.
  *
  * Offsets ARE commit versions (the natural total order the manifest
  * protocol already provides — the same identification delta-spark's
  * own streaming source draws): `getOffset` is the table's current
  * committed version; `getBatch(v₁, v₂)` replays versions v₁+1..v₂ via
  * [[ManifestTable.changesForVersion]] — appended files read as
  * `insert`s (O(new data), carried files never rescanned), overwrite /
  * merge commits surface as delete+insert [[ManifestTable.diff]] pairs.
  * Each row carries `_change` and `_commit_version`.
  *
  * V1 `Source` rather than a DSv2 `MicroBatchStream` deliberately:
  * `getBatch` returns a DataFrame, so each micro-batch IS the
  * manifest-governed parquet scan (full Catalyst pushdown, vectorized
  * reader, AQE) instead of a hand-rolled row reader — the Spark-first
  * choice. The engine sees a streaming plan via the same
  * `internalCreateDataFrame(isStreaming = true)` re-tag Spark's own
  * FileStreamSource uses ([[PlanShim.asMicroBatch]]).
  *
  * Schema is pinned at stream start (current version's manifest
  * schema + the two change columns); an additive evolution mid-stream
  * surfaces its new columns on restart, matching the checkpoint
  * contract. Consumption must stay within [[ManifestTable.vacuum]]
  * retention — the Delta change-feed contract.
  *
  * `Trigger.AvailableNow` falls back to single-batch execution (the
  * engine logs a warning: V1 sources without admission control drain
  * everything available at start as ONE batch). That is exactly the
  * run-to-current-version semantics the batch-style consumers here
  * want; versions committed DURING such a run belong to the next run,
  * the standard scheduled-job contract. A continuous deployment uses
  * the default trigger, where each new version arrives as its own
  * micro-batch (the live-pickup spec).
  *
  * Reachable three ways: `format("graft")` (the registered short name
  * — [[graft.sources.GraftFormat]] delegates its streaming-source role
  * here), the full provider class name, or the
  * [[TableFeedSource.readStream]] helper. `option("path", …)` takes a
  * storage path or a `graft:db.t` catalog name, symmetric with the
  * sink.
  */
class TableFeedProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table-feed"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), TableFeedSource.feedSchema(
      sqlContext.sparkSession, TableFeedSource.pathOf(parameters),
      TableFeedSource.rowIdsOf(parameters)))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new TableFeedSource(sqlContext.sparkSession,
      TableFeedSource.pathOf(parameters),
      TableFeedSource.maxVersionsOf(parameters),
      Some(metadataPath),
      TableFeedSource.updateImagesOf(parameters),
      TableFeedSource.rowIdsOf(parameters),
      TableFeedSource.startingVersionOf(sqlContext.sparkSession, parameters),
      TableFeedSource.maxBytesOf(parameters),
      TableFeedSource.maxFilesOf(parameters),
      TableFeedSource.skipChangesOf(parameters))
}

/** `startingVersion` (Delta's stream option, r13): subscribe from a
  * chosen upstream version instead of bootstrapping the whole history
  * — `n` delivers versions ≥ n (version n itself arrives as its
  * change rows), `"latest"` delivers only versions committed AFTER
  * subscription. The bound applies to a FRESH subscription; a
  * checkpoint resume keeps its own offset.
  */
class TableFeedSource(spark: org.apache.spark.sql.SparkSession,
                      path: String,
                      maxVersionsPerBatch: Option[Int] = None,
                      metadataPath: Option[String] = None,
                      updateImages: Boolean = false,
                      rowIds: Boolean = false,
                      startingVersion: Option[Long] = None,
                      maxBytesPerTrigger: Option[Long] = None,
                      maxFilesPerTrigger: Option[Int] = None,
                      skipChangeCommits: Boolean = false)
    extends Source {

  override val schema: StructType =
    TableFeedSource.feedSchema(spark, path, rowIds)

  /** ADMISSION CONTROL state: the highest version end this source has
    * DELIVERED (≥ the engine's committed offset by construction). With
    * `maxVersionsPerBatch` set, [[getOffset]] offers at most `lastEnd +
    * n`, so a subscriber catching up over a long gap drains in bounded
    * batches instead of one unbounded one. Persisted under the query's
    * source-metadata dir (the V1 source-private-state slot, the same
    * one FileStreamSource keeps its log in) so a RESTARTED subscriber
    * stays bounded from its first post-restart batch; losing the file
    * only costs one unbounded batch, never correctness.
    */
  private var lastEnd: Long = restoreLastEnd()

  private def metaFile: Option[org.apache.hadoop.fs.Path] =
    metadataPath.map(mp => new org.apache.hadoop.fs.Path(mp, "graft-feed-last-end"))

  private def restoreLastEnd(): Long =
    (for {
      p <- metaFile
      f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      v <- try {
        val in = f.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
        finally in.close()
      } catch { case _: Throwable => None }
    } yield v).getOrElse(0L)

  private def persistLastEnd(v: Long): Unit =
    if (maxVersionsPerBatch.isDefined || maxBytesPerTrigger.isDefined ||
        maxFilesPerTrigger.isDefined)
      metaFile.foreach { p =>
      try {
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.mkdirs(p.getParent)
        val out = f.create(p, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      } catch { case _: Throwable => () } // advisory — see lastEnd scaladoc
    }

  /** Latest committed version — the manifest listing IS the offset
    * authority, so an uncommitted (orphan) snapshot can never be
    * offered to the engine. Capped to `lastEnd + maxVersionsPerBatch`
    * and/or to the version prefix fitting `maxBytesPerTrigger` when
    * admission control is on (both caps compose — the tighter wins;
    * at least ONE version is always admitted so the stream can't
    * stall on a single oversized commit; never below the oldest
    * surviving version, so a fresh subscription can always bootstrap).
    */
  override def getOffset: Option[V1Offset] =
    ManifestTable.currentVersion(spark, path).map { cur =>
      val byCount = maxVersionsPerBatch match {
        case Some(n) => lastEnd + n
        case None    => cur
      }
      // byte budget: admit pending versions in order while their OWN
      // added bytes fit (driver metadata + FileStatus, no data read)
      // budgeted admission (bytes and/or files): admit the longest
      // contiguous prefix of pending versions whose OWN added cost
      // fits — shared walk, driver metadata only, stop at the FIRST
      // version that blows either budget (later smaller versions must
      // not leapfrog it); always at least one version
      val byBudget = (maxBytesPerTrigger, maxFilesPerTrigger) match {
        case (None, None) => cur
        case (bytesBudget, filesBudget) =>
          val pending = ManifestTable.versions(spark, path)
            .filter(v => v > lastEnd && v <= cur)
          var spentBytes = 0L
          var spentFiles = 0
          var end = lastEnd
          var stopped = false
          var first = true
          pending.foreach { v =>
            if (!stopped) {
              val b = bytesBudget.map(_ =>
                ManifestTable.versionAddedBytes(spark, path, v))
                .getOrElse(0L)
              val nf = filesBudget.map(_ =>
                ManifestTable.versionAddedFileCount(spark, path, v))
                .getOrElse(0)
              val fits = bytesBudget.forall(spentBytes + b <= _) &&
                filesBudget.forall(spentFiles + nf <= _)
              if (first || fits) {
                end = v; spentBytes += b; spentFiles += nf; first = false
              } else stopped = true
            }
          }
          if (pending.isEmpty) cur else end
      }
      val floor = ManifestTable.versions(spark, path)
        .headOption.getOrElse(cur)
      val capped =
        if (maxVersionsPerBatch.isEmpty && maxBytesPerTrigger.isEmpty &&
            maxFilesPerTrigger.isEmpty) cur
        else math.min(cur, math.max(floor, math.min(byCount, byBudget)))
      LongOffset(capped)
    }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    // a FRESH subscription starts at the declared floor (startingVersion
    // n ⇒ initial from = n−1, so version n is the first delivered);
    // checkpoint resumes carry their own offset
    val from = start.map(TableFeedSource.versionOf)
      .getOrElse(startingVersion.map(_ - 1L).getOrElse(0L))
    val to = TableFeedSource.versionOf(end)
    if (to > lastEnd) { lastEnd = to; persistLastEnd(to) }
    val vs = ManifestTable.versions(spark, path)
    // retention contract (failOnDataLoss): a resume point older than
    // the oldest surviving version cannot be replayed incrementally —
    // fail loudly rather than silently re-deliver the whole table
    require(from == 0L || vs.isEmpty || from >= vs.head,
      s"resume offset $from of $path is out of retention (oldest " +
        s"surviving version ${vs.headOption.getOrElse(-1L)}) — " +
        "re-bootstrap the subscription from the current snapshot")
    val pending = vs.filter(v => v > from && v <= to)
    // skipChangeCommits (Delta's append-only consumer contract): a
    // version that removed or DV-masked data is SKIPPED WHOLE — its
    // offset still advances (the subscription stays current), its rows
    // never deliver. The fresh-subscription bootstrap snapshot is
    // always delivered: it is a synthetic insert set, not a rewrite.
    val committed =
      if (!skipChangeCommits) pending
      else pending.filter(v =>
        (from == 0L && v == vs.head) ||
          ManifestTable.versionIsAppendOnly(spark, path, v))
    val tableCols = schema.fields.dropRight(1).map(f => col(f.name)).toSeq
    val batch = committed
      .map { v =>
        // fresh subscription onto a vacuumed history: the oldest
        // surviving version bootstraps as a snapshot of inserts (its
        // predecessor is gone, and a fresh subscriber holds nothing to
        // double-count); every later version replays incrementally
        val changes =
          if (from == 0L && v == vs.head && v != 1L)
            (if (rowIds) ManifestTable.readVersionWithRowIds(spark, path, v)
             else ManifestTable.readVersion(spark, path, v))
              .withColumn("_change", lit("insert"))
          else if (rowIds) ManifestTable.changesByRowId(spark, path, v)
          else ManifestTable.changesForVersion(spark, path, v, updateImages)
        changes.withColumn("_commit_version", lit(v))
          .select(tableCols :+ col("_commit_version"): _*)
      }
      .reduceOption(_ unionByName _)
      .getOrElse(ManifestTable.read(spark, path).limit(0)
        .withColumn("_change", lit("insert"))
        .withColumn("_commit_version", lit(0L))
        .select(schema.fieldNames.map(col).toSeq: _*))
    PlanShim.asMicroBatch(spark, batch)
  }

  override def stop(): Unit = ()
}

object TableFeedSource {

  /** Storage path or `graft:db.t` catalog name — the SAME addressing
    * the sink accepts ([[GraftSink]]), so a name-addressed table can
    * be written AND subscribed to by name. */
  private[streaming] def pathOf(parameters: Map[String, String]): String =
    graft.catalog.GraftCatalog.resolvePathSpec(
      org.apache.spark.sql.SparkSession.active,
      parameters.getOrElse("path",
        throw new IllegalArgumentException(
          "graft-table-feed needs option(\"path\", <table path or graft:db.t>)")))

  /** Option keys arrive case-lowered through the DataSource API. */
  private[streaming] def maxVersionsOf(parameters: Map[String, String]): Option[Int] =
    parameters.get("maxversionsperbatch")
      .orElse(parameters.get("maxVersionsPerBatch")).map { s =>
        val n = s.toInt
        require(n >= 1, s"maxVersionsPerBatch must be >= 1, got $n")
        n
      }

  /** `option("maxBytesPerTrigger", n)` — Delta's byte-budget admission
    * control: each micro-batch admits the longest contiguous prefix of
    * pending versions whose own ADDED bytes fit the budget (always at
    * least one version, so an oversized commit can't stall the
    * stream). Composes with `maxVersionsPerBatch` — the tighter wins. */
  private[streaming] def maxBytesOf(parameters: Map[String, String]): Option[Long] =
    parameters.get("maxbytespertrigger")
      .orElse(parameters.get("maxBytesPerTrigger")).map { s =>
        val n = s.toLong
        require(n >= 1, s"maxBytesPerTrigger must be >= 1, got $n")
        n
      }

  /** `option("maxFilesPerTrigger", n)` — Delta's file-count admission
    * control twin of the byte budget: the longest contiguous prefix of
    * pending versions whose own ADDED file count fits (always at least
    * one version). Composes with the other caps — the tightest wins. */
  private[streaming] def maxFilesOf(parameters: Map[String, String]): Option[Int] =
    parameters.get("maxfilespertrigger")
      .orElse(parameters.get("maxFilesPerTrigger")).map { s =>
        val n = s.toInt
        require(n >= 1, s"maxFilesPerTrigger must be >= 1, got $n")
        n
      }

  /** `option("skipChangeCommits", "true")` — Delta's append-only
    * consumer contract: versions that removed or DV-masked data are
    * skipped whole; only pure-append commits deliver rows. */
  private[streaming] def skipChangesOf(parameters: Map[String, String]): Boolean =
    parameters.get("skipchangecommits")
      .orElse(parameters.get("skipChangeCommits")).exists(_.toBoolean)

  private[streaming] def updateImagesOf(parameters: Map[String, String]): Boolean =
    parameters.get("updateimages").orElse(parameters.get("updateImages"))
      .exists(_.toBoolean)

  /** `option("rowIds", "true")`: row-tracked tables only — change rows
    * carry the stable [[ManifestTable.RowIdCol]] and rewrite commits
    * classify by id ([[ManifestTable.changesByRowId]]), so a consumer
    * keys its state on row identity instead of full-row equality.
    */
  private[streaming] def rowIdsOf(parameters: Map[String, String]): Boolean =
    parameters.get("rowids").orElse(parameters.get("rowIds"))
      .exists(_.toBoolean)

  /** `option("startingVersion", n | "latest")` — Delta's stream
    * bound: n ⇒ the first delivered version is n; "latest" ⇒ only
    * versions committed after subscription. The timestamp twin
    * `option("startingTimestamp", ts)` resolves against commit
    * wall-times in the log (first version at-or-after the instant —
    * Delta's rule; an instant past the head means "latest"). The two
    * options are mutually exclusive, like Delta's. */
  private[graft] def startingVersionOf(
      spark: org.apache.spark.sql.SparkSession,
      parameters: Map[String, String]): Option[Long] = {
    val byVersion = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion"))
    val byTs = parameters.get("startingtimestamp")
      .orElse(parameters.get("startingTimestamp"))
    require(byVersion.isEmpty || byTs.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    byVersion.map {
      case s if s.equalsIgnoreCase("latest") =>
        ManifestTable.currentVersion(spark, pathOf(parameters))
          .getOrElse(0L) + 1L
      case s =>
        val n = s.toLong
        require(n >= 1, s"startingVersion must be >= 1, got $n")
        n
    }.orElse(byTs.map { ts =>
      val ms = graft.plans.GraftSqlCommands.parseTimestampMillis(ts)
      val path = pathOf(parameters)
      ManifestTable.versions(spark, path)
        .find(v => ManifestTable.commitTimestamp(spark, path, v) >= ms)
        .getOrElse(ManifestTable.currentVersion(spark, path)
          .getOrElse(0L) + 1L)
    })
  }

  /** Pinned feed schema: the table's committed schema plus the change
    * metadata columns.
    */
  def feedSchema(spark: org.apache.spark.sql.SparkSession,
                 path: String, rowIds: Boolean = false): StructType = {
    val v = ManifestTable.currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(
        s"no committed version at $path — commit before subscribing"))
    val table = ManifestTable.manifestSchema(spark, path, v)
      .getOrElse(ManifestTable.readVersion(spark, path, v).schema)
    val base =
      if (!rowIds) table.fields
      else table.fields :+ StructField(ManifestTable.RowIdCol, LongType)
    StructType(base
      :+ StructField("_change", StringType, nullable = false)
      :+ StructField("_commit_version", LongType, nullable = false))
  }

  private[graft] def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json.trim.toLong
  }

  /** Subscribe to a committed table: `readStream` on the feed source.
    * `maxVersionsPerBatch` turns on admission control: a subscriber
    * resuming after a long gap (or bootstrapping onto a deep history)
    * catches up in batches of at most that many upstream versions,
    * instead of one unbounded batch.
    */
  def readStream(spark: org.apache.spark.sql.SparkSession,
                 path: String,
                 maxVersionsPerBatch: Option[Int] = None,
                 updateImages: Boolean = false,
                 rowIds: Boolean = false,
                 startingVersion: Option[String] = None,
                 maxBytesPerTrigger: Option[Long] = None,
                 maxFilesPerTrigger: Option[Int] = None,
                 skipChangeCommits: Boolean = false): DataFrame = {
    val r = spark.readStream
      .format(classOf[TableFeedProvider].getName)
      .option("path", path)
    maxVersionsPerBatch.foreach(n => r.option("maxVersionsPerBatch", n.toString))
    if (updateImages) r.option("updateImages", "true")
    if (rowIds) r.option("rowIds", "true")
    startingVersion.foreach(v => r.option("startingVersion", v))
    maxBytesPerTrigger.foreach(b => r.option("maxBytesPerTrigger", b.toString))
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    if (skipChangeCommits) r.option("skipChangeCommits", "true")
    r.load()
  }

  /** THE CLOSED CDC LOOP: subscribe to a committed orders
    * [[ManifestTable]] through this source and maintain the
    * daily-revenue gold state incrementally, exactly-once,
    * RETRACTION-AWARE — the end-to-end incremental pipeline the feed
    * source exists for:
    *
    *  - each micro-batch (= one or more committed versions) splits
    *    into insert and delete change rows;
    *  - the delta state is state(inserts) merged with the NEGATED
    *    state(deletes) ([[graft.pipeline.Incremental.negateDailyState]]
    *    — decimal sums/counts negate exactly), so an upstream
    *    overwrite/merge/delete retracts precisely what its old rows
    *    once contributed, bit-for-bit;
    *  - groups whose row count reaches zero are dropped (no
    *    tombstones);
    *  - each refresh commits atomically under the batch's tag
    *    (replays no-op — the `streamMergeableGold` exactly-once
    *    contract).
    *
    * Scale shape: per upstream commit the consumer reads only that
    * version's change rows (append = new files only) and touches the
    * gold state at group cardinality — neither the fact history nor
    * the full table is ever rescanned. Returns (merged, skipped).
    */
  def feedGoldDaily(spark: org.apache.spark.sql.SparkSession,
                    tablePath: String, statePath: String,
                    checkpointLocation: String = null): (Long, Long) = {
    import graft.pipeline.Incremental
    feedMergeableGold(spark, tablePath, statePath, checkpointLocation,
      "feed-gold-daily",
      Incremental.dailyState, Incremental.negateDailyState,
      Incremental.mergeDailyState, col("cnt_rows") > 0,
      Seq("o_custkey", "day"))
  }

  /** The quantile twin: the SAME retraction-aware feed loop maintains
    * the mergeable histogram state — percentile dashboards read
    * [[graft.ops.Sketches.quantilesFromState]] over the committed
    * state, refreshed by upstream commits only.
    */
  def feedGoldQuantiles(spark: org.apache.spark.sql.SparkSession,
                        tablePath: String, statePath: String,
                        checkpointLocation: String = null): (Long, Long) = {
    import graft.pipeline.Incremental
    feedMergeableGold(spark, tablePath, statePath, checkpointLocation,
      "feed-gold-quantile",
      Incremental.histogramState(_), Incremental.negateHistogramState,
      Incremental.mergeHistogramState, col("n") > 0, Seq("day", "bin"))
  }

  /** The heavy-tailed twin: feed-maintained LOG-BIN sketch state
    * ([[graft.pipeline.Incremental.ddSketchState]]) — bounded cells on
    * unbounded value domains, same retraction-aware loop.
    */
  def feedGoldSketch(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String, statePath: String,
                     checkpointLocation: String = null): (Long, Long) = {
    import graft.pipeline.Incremental
    feedMergeableGold(spark, tablePath, statePath, checkpointLocation,
      "feed-gold-sketch",
      Incremental.ddSketchState(_), Incremental.negateDdSketchState,
      Incremental.mergeDdSketchState, col("n") > 0, Seq("day", "bin"))
  }

  /** Commit one mergeable-state DELTA as a KEYED copy-on-write merge
    * (round 12 — closes the per-batch full-state rewrite): the state
    * table carries a synthesized single-column group key (`_gkey`,
    * the group columns concatenated — [[ManifestTable.merge]] keys on
    * one column), and each batch
    *
    *  1. semi-joins the CURRENT state to the delta's group keys (a
    *     column-pruned read; only touched groups' rows materialize),
    *  2. merges the delta into exactly those rows (tiny aggregate),
    *  3. commits them through the keyed CoW merge: update-wins for
    *     changed groups, insert for new ones, delete-flag for fully
    *     retracted ones — so only state FILES holding touched groups
    *     rewrite, untouched files carry byte-identical
    *     (spec-asserted).
    *
    * At high-cardinality gold this turns O(state) write amplification
    * per batch into O(changed groups) — the difference between a gold
    * table that scales with history and one that rewrites itself on
    * every upstream commit. The first batch (no committed state)
    * writes the delta directly.
    */
  /** Bytes of live state below which [[commitStateDelta]] prefers one
    * plain rewrite over the keyed merge. The keyed path wins
    * asymptotically (O(changed groups) I/O) but carries fixed
    * per-commit machinery (key scan, semi-join confirm, per-file
    * stats); while the whole state is a handful of small files, a
    * single read-merge-write commit is strictly cheaper. Override with
    * `spark.graft.stateMergeBytes` (set 0 to force the keyed path).
    */
  val DefaultStateMergeBytes: Long = 256L * 1024 * 1024

  /** Collision-safe group-key encoding: each key value becomes a
    * LENGTH-PREFIXED segment `v<len>:<value>` (self-delimiting, so a
    * value containing any separator character cannot fuse two
    * segments), and NULL becomes the sentinel `n;` — distinct from
    * every `v...` segment and from the empty string (`v0:`). A plain
    * concat_ws would conflate ("a|b") with ("a","b") and silently
    * DROP nulls, merging unrelated state groups. */
  private[streaming] def stateKeyed(df: DataFrame,
                                    keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{concat, length, lit, when}
    df.withColumn("_gkey", concat(keyCols.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("n;"))
        .otherwise(concat(lit("v"), length(s).cast("string"), lit(":"), s))
    }: _*))
  }

  private[streaming] def commitStateDelta(sp: org.apache.spark.sql.SparkSession,
      statePath: String, delta0: DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      live: org.apache.spark.sql.Column,
      keyCols: Seq[String], tag: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, lit, not}
    def withKey(df: DataFrame): DataFrame = stateKeyed(df, keyCols)
    ManifestTable.currentVersion(sp, statePath) match {
      case None =>
        ManifestTable.write(withKey(delta0.filter(live)), statePath,
          tag = Some(tag)): Unit
      case Some(v) =>
        // the delta feeds 2-3 consumers below — materialize once
        val delta = delta0.cache()
        try {
          val threshold = sp.conf.getOption("spark.graft.stateMergeBytes")
            .map(_.toLong).getOrElse(DefaultStateMergeBytes)
          val st = ManifestTable.resolveState(sp, statePath, v)
          val conf = sp.sparkContext.hadoopConfiguration
          val liveBytes = st.files.map { r =>
            val fp = new org.apache.hadoop.fs.Path(s"$statePath/$r")
            try fp.getFileSystem(conf).getFileStatus(fp).getLen
            catch { case _: java.io.IOException => 0L }
          }.sum
          if (liveBytes < threshold) {
            // small-state fast path: one read-merge-write commit (the
            // keyed machinery would cost more than it saves)
            val current = ManifestTable.read(sp, statePath).drop("_gkey")
            val state = withKey(merge(current, delta).filter(live))
            // lineage cut: the merged state reads the files the
            // overwrite replaces (concurrent-vacuum safety); blocks
            // freed right after the commit
            val prevRdds = sp.sparkContext.getPersistentRDDs.keySet
            val pinned = state.localCheckpoint()
            try ManifestTable.write(pinned, statePath, tag = Some(tag)): Unit
            finally sp.sparkContext.getPersistentRDDs
              .filterNot { case (rid, _) => prevRdds(rid) }
              .valuesIterator.foreach(_.unpersist(blocking = false))
          } else {
            val current = ManifestTable.read(sp, statePath)
            val deltaKeys = withKey(delta).select("_gkey").distinct()
            val touched = current
              .join(broadcast(deltaKeys), Seq("_gkey"), "left_semi")
              .drop("_gkey")
            val newTotal = withKey(merge(touched, delta))
            val upserts = newTotal.withColumn("_graft_dead", not(live))
            ManifestTable.merge(upserts, statePath, key = "_gkey",
              deleteCol = Some("_graft_dead"), tag = Some(tag)): Unit
          }
        } finally delta.unpersist(blocking = false)
    }
  }

  /** Shared retraction-aware exactly-once maintenance of ANY mergeable
    * gold state from a table feed ([[feedGoldDaily]] /
    * [[feedGoldQuantiles]]): delta = state(inserts) merged with
    * negate(state(deletes)); groups failing `live` (fully retracted)
    * drop; each refresh commits atomically under the batch tag.
    */
  /** Non-image gold maintenance shares the SAME batch CDC fold as the
    * images variant (r13 — through r12 this was its own AvailableNow
    * streaming lifecycle per call): new-side/old-side state exceptAll
    * gives these consumers the aggregate-irrelevant-rewrite
    * cancellation for free, and the per-call fixed cost drops to the
    * fold's own jobs. (merged, skipped) reading is unchanged —
    * a cancelled fold reports (0, 0).
    */
  private def feedMergeableGold(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, statePath: String, checkpointLocation: String,
      tagPrefix: String,
      stateOf: DataFrame => DataFrame,
      negate: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      live: org.apache.spark.sql.Column,
      keyCols: Seq[String]): (Long, Long) = {
    val (m, s, _) = feedMergeableGoldImages(spark, tablePath, statePath,
      checkpointLocation, tagPrefix, stateOf, negate, merge, live, keyCols)
    (m, s)
  }

  /** Generalized retraction-aware feed fold — the
    * [[graft.pipeline.Dag]] Aggregate flow's engine: maintain ANY
    * mergeable state at `statePath` from `tablePath`'s change feed
    * (the exact [[feedGoldDaily]] machinery with caller-supplied
    * state functions). Exactly-once via per-range tags
    * `<tagPrefix>-v<upstreamVersion>`; image-aware cancellation;
    * returns (merged, skipped, unchanged). */
  def feedFold(spark: org.apache.spark.sql.SparkSession,
               tablePath: String, statePath: String, tagPrefix: String,
               stateOf: DataFrame => DataFrame,
               negate: DataFrame => DataFrame,
               merge: (DataFrame, DataFrame) => DataFrame,
               live: org.apache.spark.sql.Column,
               keyCols: Seq[String],
               checkpointLocation: String = null): (Long, Long, Long) =
    feedMergeableGoldImages(spark, tablePath, statePath,
      checkpointLocation, tagPrefix, stateOf, negate, merge, live, keyCols)

  /** FULL-REFRESH twin of [[feedFold]] (the [[graft.pipeline.Dag]]
    * Aggregate flow's full-refresh engine): recompute the ENTIRE
    * state from the upstream table's CURRENT content — one aggregate
    * over one snapshot scan, no change feed — and commit it as ONE
    * atomic overwrite carrying the fold's own watermark tag
    * (`<tagPrefix>-v<upstreamVersion>`), so the NEXT incremental fold
    * resumes exactly past the rebuild. O(table) by definition (a full
    * refresh IS the recompute); the incremental fold stays the
    * per-refresh path. Returns the upstream version the rebuild
    * covered (0 when the upstream has no committed version — nothing
    * written). */
  def feedFoldFull(spark: org.apache.spark.sql.SparkSession,
                   tablePath: String, statePath: String,
                   tagPrefix: String,
                   stateOf: DataFrame => DataFrame,
                   live: org.apache.spark.sql.Column,
                   keyCols: Seq[String]): Long = {
    val cur = ManifestTable.currentVersion(spark, tablePath)
      .getOrElse(return 0L)
    val state = stateKeyed(
      stateOf(ManifestTable.read(spark, tablePath)).filter(live), keyCols)
    ManifestTable.write(state, statePath,
      tag = Some(s"$tagPrefix-v$cur")): Unit
    cur
  }

  /** UPDATE-IMAGE-AWARE gold maintenance: the same closed CDC loop as
    * [[feedGoldDaily]], consuming the feed with `updateImages = true`
    * so a MERGE's matched keys arrive as update_preimage/postimage
    * pairs instead of delete+insert — and exploiting them:
    *
    *  - per batch, the pre-image and post-image rows aggregate to
    *    their group states; a multiset `exceptAll` in EACH direction
    *    cancels every group whose contribution is IDENTICAL on both
    *    sides (exact decimal/count state — equality is well-defined),
    *    so an upstream merge that only touched aggregate-IRRELEVANT
    *    columns contributes nothing;
    *  - plain inserts/deletes fold as before (changed-group post
    *    states merge forward, changed-group pre states negate);
    *  - when the whole delta cancels, the batch commits NOTHING — no
    *    state version, no tag (safe: a replay recomputes the same
    *    empty delta). The insert/delete consumer would have negated
    *    and re-added every touched group and rewritten the state
    *    table for a net-zero change.
    *
    * Scale shape: metadata-churn merges (backfills of descriptive
    * columns, typo fixes) on a 100 TB fact table stop costing gold
    * refreshes entirely; only groups whose aggregate inputs actually
    * changed pay the negate-merge cycle. Returns (merged, skipped,
    * unchanged-batches).
    */
  def feedGoldDailyImages(spark: org.apache.spark.sql.SparkSession,
                          tablePath: String, statePath: String,
                          checkpointLocation: String = null): (Long, Long, Long) = {
    import graft.pipeline.Incremental
    feedMergeableGoldImages(spark, tablePath, statePath, checkpointLocation,
      "feed-gold-daily-img",
      Incremental.dailyState, Incremental.negateDailyState,
      Incremental.mergeDailyState, col("cnt_rows") > 0,
      Seq("o_custkey", "day"))
  }

  /** BATCH CDC FOLD (round 13 — replaces the AvailableNow streaming
    * lifecycle this ran as through round 12): one call reads the
    * change rows of every upstream version past the consumer's
    * watermark DIRECTLY (the identical
    * [[ManifestTable.changesForVersion]] unit the feed source serves),
    * folds them through the pre/post-image cancellation, and commits
    * at most ONE state delta. Same observable contract, none of the
    * fixed per-call streaming machinery (query lifecycle, checkpoint
    * dir, offset log, micro-batch scheduling — ~2/3 of the wall time
    * at bench scale, measured by DevFeedTime).
    *
    * Exactly-once without an engine checkpoint: the watermark is the
    * tag `<tagPrefix>-v<upstreamVersion>` COMMITTED ATOMICALLY with
    * the state delta — recovery takes the highest surviving tag, so a
    * crash between commit and the advisory watermark-file write can
    * never double-fold. The advisory file covers the cancelled-batch
    * case (nothing committed → nothing to tag; re-folding a cancelled
    * range is a no-op anyway, the file just skips the recompute) and
    * tag-horizon expiry. Returns (merged, skipped, unchanged) —
    * merged/unchanged are at most 1 per call now (one combined fold).
    */
  private def feedMergeableGoldImages(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String, statePath: String, checkpointLocation: String,
      tagPrefix: String,
      stateOf: DataFrame => DataFrame,
      negate: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      live: org.apache.spark.sql.Column,
      keyCols: Seq[String]): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.lit
    val conf = spark.sparkContext.hadoopConfiguration
    val markPath = new org.apache.hadoop.fs.Path(
      if (checkpointLocation != null) s"$checkpointLocation/$tagPrefix.watermark"
      else statePath.stripSuffix("/") + s"_$tagPrefix.watermark")
    def readMark(): Long =
      try {
        val f = markPath.getFileSystem(conf)
        if (!f.exists(markPath)) 0L
        else {
          val in = f.open(markPath)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim.toLong
          finally in.close()
        }
      } catch { case _: Throwable => 0L }
    def writeMark(v: Long): Unit =
      try {
        val f = markPath.getFileSystem(conf)
        f.mkdirs(markPath.getParent)
        val out = f.create(markPath, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      } catch { case _: Throwable => () } // advisory — tags are the truth
    val cur = ManifestTable.currentVersion(spark, tablePath)
      .getOrElse(return (0L, 0L, 0L))
    val tagWater = ManifestTable.currentVersion(spark, statePath)
      .map(v => ManifestTable.resolveState(spark, statePath, v).tags.keys
        .filter(_.startsWith(s"$tagPrefix-v"))
        .map(_.stripPrefix(s"$tagPrefix-v").toLong))
      .getOrElse(Iterable.empty)
    val last = (tagWater ++ Seq(readMark())).foldLeft(0L)(math.max)
    if (cur <= last) return (0L, 1L, 0L)
    val allVs = ManifestTable.versions(spark, tablePath)
    // retention contract (the feed source's failOnDataLoss rule): a
    // resume point older than the oldest surviving version cannot be
    // replayed incrementally — fail loudly, never re-deliver silently
    require(last == 0L || allVs.isEmpty || last + 1 >= allVs.head,
      s"fold resume point $last of $tablePath is out of retention " +
        s"(oldest surviving version ${allVs.headOption.getOrElse(-1L)}) — " +
        "re-bootstrap the subscription from the current snapshot")
    val vs = allVs.filter(v => v > last && v <= cur)
    val batch0 = vs.map { v =>
      // vacuumed-history bootstrap: the oldest surviving version of a
      // FRESH subscription reads as a snapshot of inserts (its
      // predecessor is gone) — the feed source's exact rule
      val changes =
        if (last == 0L && v == vs.head && v != 1L)
          ManifestTable.readVersion(spark, tablePath, v)
            .withColumn("_change", lit("insert"))
        else ManifestTable.changesForVersion(spark, tablePath, v)
      changes.withColumn("_commit_version", lit(v))
    }.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(return (0L, 0L, 0L))
    // an INSERT-ONLY fold (appends / the initial load / the snapshot
    // bootstrap) has no retractions and no images by construction —
    // its delta is ONE aggregate over the change rows, skipping the
    // pre/post/exceptAll machinery entirely (manifest metadata says
    // so; no data scan decides this)
    val insertOnly = vs.forall(v => v == 1L ||
      (last == 0L && v == vs.head) ||
      ManifestTable.commitAddsOnly(spark, tablePath, v))
    val toFree = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val delta =
      if (insertOnly) stateOf(batch0)
      else {
        // NEW-side vs OLD-side state contributions (r13 — was a
        // six-aggregate pre/post-image split): exact per-group ROW
        // equality between the two sides cancels every group whose
        // aggregate inputs did not change, so an aggregate-irrelevant
        // rewrite yields an EMPTY delta and commits no state version —
        // the image-awareness contract, at two aggregates instead of
        // six (cancellation lives at the STATE level; the row-level
        // pre/post vocabulary is only needed by consumers that must
        // distinguish updates from delete+insert, not by this fold)
        val b = batch0.cache(); toFree += b
        val cNew = stateOf(b.filter(
          col("_change").isin("insert", "update_postimage"))).cache()
        val cOld = stateOf(b.filter(
          col("_change").isin("delete", "update_preimage"))).cache()
        toFree += cNew; toFree += cOld
        merge(cNew.exceptAll(cOld), negate(cOld.exceptAll(cNew)))
      }
    // one materialization serves the emptiness probe AND the commit —
    // without it the deep delta DAG would execute twice more
    val deltaC = delta.cache(); toFree += deltaC
    try {
      if (deltaC.isEmpty) { writeMark(cur); (0L, 0L, 1L) }
      else {
        commitStateDelta(spark, statePath, deltaC, merge, live,
          keyCols, s"$tagPrefix-v$cur")
        writeMark(cur)
        (1L, 0L, 0L)
      }
    } finally toFree.foreach(_.unpersist(blocking = false))
  }

  /** Declared table-as-stream query: four commit styles — initial
    * overwrite, two appends, one keyed copy-on-write merge — land in a
    * [[ManifestTable]], then ONE streaming subscription replays the
    * whole history as change rows. The DuckDB oracle recomputes every
    * version's contribution relationally (version = 1 + key mod 3 for
    * the three loads; the merge's delete+insert pair at version 4), so
    * a hash match proves offset bookkeeping (each row tagged with the
    * right `_commit_version`), the append fast path (appended files as
    * inserts), and the diff fallback (merge surfacing as delete+insert)
    * in one gate.
    *
    * Scale shape: per micro-batch the feed reads ONLY the files the
    * version appended (append path) or the two-version diff (rewrite
    * path) — a subscriber tails a 100 TB append-mostly table at the
    * cost of the new data, never the table.
    */
  def streamTableFeed(spark: org.apache.spark.sql.SparkSession,
                      sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_table_feed_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val path = root.toString + "/orders_feed"
    val orders = graft.Tables.orders(spark, sfDir)
    ManifestTable.write(orders.filter(col("o_orderkey") % 3 === 0), path)  // v1
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 === 1), path) // v2
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 === 2), path) // v3
    ManifestTable.merge(                                                   // v4
      orders.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
      path, "o_orderkey")
    val qName = s"table_feed_${System.nanoTime()}"
    val q = readStream(spark, path).writeStream
      .format("memory").queryName(qName).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(qName)
      .orderBy(col("o_orderkey"), col("_commit_version"), col("_change"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Declared ADMISSION-CONTROLLED feed query: the same four-commit
    * history as [[streamTableFeed]], drained with
    * `maxVersionsPerBatch = 1` — a subscriber bootstrapping onto the
    * full history catches up one upstream version per micro-batch
    * (four batches) instead of one unbounded batch. The oracle is the
    * SAME relational recompute as the unbounded drain: a hash match
    * proves admission control changes BATCHING ONLY — every change row
    * still arrives exactly once with its correct `_commit_version`,
    * across batch boundaries and through the offset bookkeeping that
    * caps each batch.
    *
    * Scale shape: this is the bound that makes resuming a lagged
    * subscriber safe on a 100 TB table — catch-up cost per micro-batch
    * is capped at `n` versions' worth of new data, never the whole
    * backlog in one task graph.
    */
  def streamTableFeedBounded(spark: org.apache.spark.sql.SparkSession,
                             sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_table_feed_b_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val path = root.toString + "/orders_feed_b"
    val orders = graft.Tables.orders(spark, sfDir)
    ManifestTable.write(orders.filter(col("o_orderkey") % 3 === 0), path)  // v1
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 === 1), path) // v2
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 === 2), path) // v3
    ManifestTable.merge(                                                   // v4
      orders.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
      path, "o_orderkey")
    val qName = s"table_feed_bounded_${System.nanoTime()}"
    val q = readStream(spark, path, maxVersionsPerBatch = Some(1))
      .writeStream
      .format("memory").queryName(qName).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(qName)
      .orderBy(col("o_orderkey"), col("_commit_version"), col("_change"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Declared STARTING-VERSION feed query (round 13, Delta's
    * `option("startingVersion", n)` stream bound): a three-commit
    * history subscribed from version 2 — the bootstrap SKIPS v1
    * entirely (its change rows never enter any micro-batch) and the
    * drain delivers exactly v2's and v3's inserts with their commit
    * tags. The oracle recomputes those two slices relationally; a hash
    * match proves the declared floor bounds the FIRST offset (not a
    * post-hoc filter — v1's data is never read) and versions at or
    * after the floor still arrive exactly once.
    *
    * Scale shape: this is how a new subscriber joins a 100 TB table's
    * feed without paying the full-history bootstrap — snapshot once by
    * batch read, then subscribe from the snapshot version forward.
    */
  def streamTableFeedFrom(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_table_feed_sv_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val path = root.toString + "/orders_feed_sv"
    val orders = graft.Tables.orders(spark, sfDir)
    ManifestTable.write(orders.filter(col("o_orderkey") % 3 === 0), path)  // v1
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 === 1), path) // v2
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 === 2), path) // v3
    val qName = s"table_feed_sv_${System.nanoTime()}"
    val q = readStream(spark, path, startingVersion = Some("2"))
      .writeStream
      .format("memory").queryName(qName).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(qName)
      .orderBy(col("o_orderkey"), col("_commit_version"), col("_change"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }

  /** Declared UPDATE-IMAGE feed query: the [[streamTableFeed]] history
    * drained with `option("updateImages", "true")` — the merge commit's
    * updated keys arrive as `update_preimage`/`update_postimage` PAIRS
    * (Delta CDF's vocabulary) instead of delete+insert, so a consumer
    * can distinguish an UPDATE from a genuine delete-then-insert
    * without keeping its own key state. Appends are unaffected. The
    * oracle recomputes the classification relationally; a hash match
    * proves the image split survives the streaming path (offsets,
    * batching, the schema pin) end to end.
    */
  /** Declared image-aware gold-maintenance query: the orders table
    * takes (1) an initial load, (2) a COSMETIC merge touching only
    * `o_orderpriority` — not an input of the daily state — and (3) a
    * price-doubling merge; [[feedGoldDailyImages]] refreshes the gold
    * state after each. The cosmetic refresh is REQUIRED in-query to
    * commit no state version (the update images cancel), which the
    * plain insert/delete consumer cannot do — it would negate and
    * re-add every touched group for a net-zero delta. The oracle
    * recomputes the final daily state relationally from the surviving
    * facts.
    */
  def feedGoldImagesQuery(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_feed_gold_i_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val table = root.toString + "/orders_fgi"
    val state = root.toString + "/gold_fgi"
    val orders = graft.Tables.orders(spark, sfDir)
    ManifestTable.write(orders.filter(col("o_orderkey") % 2 === 0), table)
    feedGoldDailyImages(spark, table, state)
    // cosmetic: aggregate-irrelevant column only — must cancel
    ManifestTable.merge(
      ManifestTable.read(spark, table).filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderpriority", lit("5-RECLASSIFIED")),
      table, "o_orderkey")
    val before = ManifestTable.currentVersion(spark, state)
    val (_, _, unchanged) = feedGoldDailyImages(spark, table, state)
    require(unchanged == 1L
        && ManifestTable.currentVersion(spark, state) == before,
      s"cosmetic merge must cancel in the image-aware consumer " +
        s"(unchanged=$unchanged)")
    // relevant: price doubled on a slice — folds exactly
    ManifestTable.merge(
      ManifestTable.read(spark, table).filter(col("o_orderkey") % 41 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2.0),
      table, "o_orderkey")
    feedGoldDailyImages(spark, table, state)
    graft.pipeline.Incremental.presentDaily(
      ManifestTable.read(spark, state))
  }

  def streamTableFeedImages(spark: org.apache.spark.sql.SparkSession,
                            sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_table_feed_i_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val path = root.toString + "/orders_feed_i"
    val orders = graft.Tables.orders(spark, sfDir)
    ManifestTable.write(orders.filter(col("o_orderkey") % 3 === 0), path,
      statsCols = Seq("o_orderkey"))                                   // v1
    ManifestTable.append(orders.filter(col("o_orderkey") % 3 =!= 0), path,
      statsCols = Seq("o_orderkey"))                                   // v2
    ManifestTable.merge(                                               // v3
      orders.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("o_orderpriority", lit("0-IMG")),
      path, "o_orderkey", statsCols = Seq("o_orderkey"))
    val qName = s"table_feed_images_${System.nanoTime()}"
    val q = readStream(spark, path, updateImages = true)
      .writeStream
      .format("memory").queryName(qName).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(qName)
      .orderBy(col("o_orderkey"), col("_commit_version"), col("_change"))
      .localCheckpoint()
    spark.catalog.dropTempView(qName)
    out
  }
}
