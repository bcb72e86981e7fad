package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative pipeline DAG — DLT's product shape (reference analog:
  * the medallion chain `/root/reference/src/etl_pipeline.py:196-201`
  * runs bronze→silver→gold→ML in hand-written order; delta-live-tables
  * declares the same graph and lets the engine order and
  * incrementalize it). The user declares TABLES with dependencies,
  * each optionally carrying [[Expectations]]; ONE [[Dag.refresh]]
  * call runs every table in topological order, INCREMENTALLY wherever
  * the flow shape allows:
  *
  *  - [[Dag.Ingest]] — the graph's entry edges: a caller-supplied
  *    batch per run appends under a per-run idempotency tag (a
  *    replayed run is a no-op);
  *  - [[Dag.Transform]] — a ROW-WISE flow over one upstream table:
  *    each refresh reads ONLY the upstream versions past the flow's
  *    high-water (one O(new files) change-feed read per version,
  *    never the table), transforms, gates, and appends under the
  *    version-range tag. Non-append upstream commits refuse loudly —
  *    a row-wise flow cannot retract (use Aggregate or Materialize);
  *  - [[Dag.Aggregate]] — a MERGEABLE-STATE flow (the
  *    `feed_gold_images` fold as a declarative verb): per refresh the
  *    upstream delta folds into the state table retraction-aware and
  *    image-cancelling, committing at most one state version;
  *  - [[Dag.Materialize]] — full recompute over any number of
  *    upstreams (the always-correct fallback for flows that are
  *    neither row-wise nor mergeable);
  *  - [[Dag.Cdc]] — APPLY CHANGES as a pipeline edge: the upstream
  *    is an append-only CDC event feed; each refresh applies the new
  *    versions through the SCD1/SCD2 verb (sequence ordering,
  *    deletes, `_seq` high-water all inherited), creating the target
  *    on first refresh.
  *
  * Every refresh appends one row per table to the pipeline EVENT LOG
  * (a [[ManifestTable]]): run id, flow kind, outcome, upstream
  * versions/files actually read (the incrementality audit), rows
  * observed, committed version, and per-rule expectation metrics —
  * DLT's event log surface, queryable like any table via [[events]].
  *
  * Scale shape: after the first run, a refresh touches O(new
  * upstream data) per Transform edge and O(changed groups) per
  * Aggregate edge — a 100 TB bronze history is never rescanned; the
  * event log records the files-read arithmetic that proves it.
  * Exactly-once end to end: every commit (ingest, transform range,
  * state delta, event append) carries an idempotency tag, so a
  * crashed or replayed run re-derives only no-ops.
  */
object Dag {

  sealed trait Flow { def inputs: Seq[String]; def kind: String }

  /** Entry edge: `batchOf(spark, runId)` produces the rows this run
    * lands (a source-directory read, an upstream export, a fixture
    * slice). Appends exactly once per run id.
    *
    * Determinism contract: the run tag makes replays idempotent by
    * FIRST COMMIT WINS, not by value — a replayed run id whose closure
    * would now produce different rows (a non-deterministic read, a
    * mutated source) no-ops against the tag, so the ORIGINAL batch
    * stands and the variant is discarded. That is the safe reading
    * (exactly-once per run id either way); callers who need the new
    * rows must land them under a NEW run id. */
  final case class Ingest(batchOf: (SparkSession, Long) => DataFrame)
      extends Flow {
    val inputs: Seq[String] = Nil; val kind = "ingest"
  }

  /** Row-wise incremental flow over one upstream managed table. */
  final case class Transform(of: String,
                             rowFlow: DataFrame => DataFrame)
      extends Flow {
    def inputs: Seq[String] = Seq(of); val kind = "transform"
  }

  /** Mergeable-state incremental flow over one upstream managed
    * table: `stateOf` aggregates change rows to per-group state,
    * `negate` retracts, `merge` folds two states, groups failing
    * `live` drop (no tombstones). Exactness contract: state columns
    * must merge associatively bit-for-bit (decimal sums / long
    * counts — see [[Incremental]]). */
  final case class Aggregate(of: String,
                             stateOf: DataFrame => DataFrame,
                             negate: DataFrame => DataFrame,
                             merge: (DataFrame, DataFrame) => DataFrame,
                             live: Column,
                             keyCols: Seq[String]) extends Flow {
    def inputs: Seq[String] = Seq(of); val kind = "aggregate"
  }

  /** COMPILE a restricted SQL-shaped aggregate into the mergeable-
    * state triple (the `AGGREGATE FROM ... GROUP BY ... AGG (...)`
    * SQL flow): each agg is (fn, argExpr, name) with fn ∈ SUM|COUNT.
    * SUM compiles to an exact `DECIMAL(30,6)` sum (decimal addition
    * is associative, so the fold merges and NEGATES bit-exactly —
    * the [[Incremental]] contract; a double sum would drift by
    * accumulation order), COUNT(*)/COUNT(expr) to long counts. An
    * implicit `_rows` row count rides along as the liveness column —
    * a fully retracted group leaves no tombstone. AVG is a READ-side
    * derivation (SUM/COUNT) by design: averages don't merge. */
  def aggregateOf(of: String, groupBy: Seq[String],
                  aggs: Seq[(String, String, String)]): Aggregate = {
    require(groupBy.nonEmpty, "AGGREGATE needs at least one GROUP BY column")
    require(aggs.nonEmpty, "AGGREGATE needs at least one AGG entry")
    val names = aggs.map(_._3)
    require(names.distinct.size == names.size &&
        !names.exists(n => n == "_rows" || groupBy.contains(n)),
      s"AGG output names must be distinct, not '_rows', and not " +
        s"collide with GROUP BY columns: $names")
    val stateCols = aggs.map {
      case ("sum", e, n)   => sum(expr(e).cast("decimal(30,6)")).as(n)
      case ("count", "*", n) => count(lit(1)).as(n)
      case ("count", e, n) => count(expr(e)).as(n)
      case (fn, _, n) => throw new IllegalArgumentException(
        s"AGGREGATE supports SUM and COUNT (got $fn AS $n) — AVG is " +
          "a read-side SUM/COUNT derivation; other aggregates need " +
          "the Scala Aggregate flow with explicit state functions")
    } :+ count(lit(1)).as("_rows")
    val stateNames = names :+ "_rows"
    val keyCols = groupBy
    Aggregate(of,
      stateOf = df => df.groupBy(keyCols.map(col): _*)
        .agg(stateCols.head, stateCols.tail: _*),
      negate = df => df.select(keyCols.map(col) ++
        stateNames.map(n => (-col(n)).as(n)): _*),
      merge = (a, b) => a.unionByName(b)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(stateNames.head)).as(stateNames.head),
          stateNames.tail.map(n => sum(col(n)).as(n)): _*),
      live = col("_rows") > 0,
      keyCols = keyCols)
  }

  /** Full recompute over any upstreams — the fallback shape. */
  final case class Materialize(inputs: Seq[String],
                               compute: Map[String, DataFrame] => DataFrame)
      extends Flow {
    val kind = "materialize"
  }

  /** File-ledger ingest edge (`AS COPY FROM` in the SQL spelling):
    * each refresh COPY-INTOs the source directory — only files never
    * ingested before land (the table's copy LEDGER is the watermark,
    * no run id needed), so the edge is incremental and idempotent by
    * construction. A missing target is created empty from the source
    * schema. Flow-level expectations refuse here: COPY INTO already
    * gates through the table's PERSISTED rules — declare them with
    * `ALTER TABLE ... ADD EXPECTATION` and the counts land in the
    * copy commit's own log entry. */
  final case class CopyFrom(dir: String, format: String = "parquet",
                            pattern: String = "*") extends Flow {
    val inputs: Seq[String] = Nil; val kind = "copy"
  }

  /** APPLY CHANGES as a pipeline edge (DLT's CDC flow): the upstream
    * table is an append-only CDC EVENT FEED; each refresh applies the
    * versions past the flow's high-water through
    * [[ApplyChanges.applyScd1]] (or [[ApplyChanges.applyScd2]] when
    * `scd2Tracked` names the history-tracked columns, at logical time
    * = the upstream version) — in-batch reduction, cross-batch `_seq`
    * ordering, deletes, all inherited. A missing target initializes
    * EMPTY with the feed's business schema (DLT creates the target).
    * Expectations gate the EVENT batch before the apply. */
  final case class Cdc(of: String, key: String, sequenceBy: String,
                       deleteWhen: Option[String] = None,
                       scd2Tracked: Option[Seq[String]] = None)
      extends Flow {
    def inputs: Seq[String] = Seq(of); val kind = "cdc"
  }

  /** A SOURCE the pipeline reads but does not manage (`EXTERNAL` in
    * the SQL spelling): registers the table's path under its name so
    * downstream edges can reference it; refresh never writes it — the
    * outcome row reports the source's current version. The natural
    * upstream for a [[SnapshotCdc]] edge, whose source is REPLACED
    * out-of-band between refreshes (an overwritten upstream would
    * refuse under [[Transform]]'s append-only contract). */
  final case class External() extends Flow {
    val inputs: Seq[String] = Nil; val kind = "external"
  }

  /** APPLY CHANGES FROM SNAPSHOT as a pipeline edge (DLT's
    * `apply_changes_from_snapshot` flow): the upstream's CURRENT
    * content is a full SNAPSHOT asserting the key population — each
    * refresh diffs it against the dimension through
    * [[ApplyChanges.applyScd1FromSnapshot]] (or the SCD2 sibling when
    * `scd2Tracked` names the history-tracked columns), at snapshot
    * sequence = the upstream version: absent keys delete, changed
    * keys update, new keys insert, unchanged keys emit NOTHING (the
    * merge stays O(changed)). No SEQUENCE BY — the upstream version
    * IS the sequence, DLT's shape. A missing target initializes EMPTY
    * from the snapshot's schema. The upstream may be [[External]] or
    * any managed table; overwrites upstream are fine (the edge reads
    * content, not a change feed). Each applied upstream version tags
    * the dimension, so a replayed refresh no-ops. */
  final case class SnapshotCdc(of: String, key: String,
                               scd2Tracked: Option[Seq[String]] = None)
      extends Flow {
    def inputs: Seq[String] = Seq(of); val kind = "snapshot_cdc"
  }

  final case class TableDef(name: String, path: String, flow: Flow,
                            expectations: Seq[Expectations.Expectation] = Nil,
                            statsCols: Seq[String] = Nil,
                            quarantineAt: Option[String] = None) {
    require(name.nonEmpty && !name.contains(";"),
      s"table name '$name' must be non-empty without ';'")
    require(flow.kind != "aggregate" || expectations.isEmpty,
      s"table '$name': expectations on an Aggregate flow are refused " +
        "— a state DELTA is not row output, so drop/fail semantics " +
        "would silently differ from DLT's; attach the rules to the " +
        "row-wise flow upstream")
    require(flow.kind != "copy" || expectations.isEmpty,
      s"table '$name': flow-level expectations on a CopyFrom edge are " +
        "refused — COPY INTO gates through the table's PERSISTED " +
        "rules (ALTER TABLE ... ADD EXPECTATION), which also records " +
        "the counts in the copy commit's log entry")
    // QUARANTINE (DLT's documented invalid-record pattern as a verb):
    // rows the flow's DROP rules filter land in a side table instead
    // of vanishing — triage without blocking the pipeline
    require(quarantineAt.isEmpty ||
        (Set("ingest", "transform").contains(flow.kind) &&
          expectations.exists(_.action == Expectations.Drop)),
      s"table '$name': QUARANTINE needs a landing flow (ingest/" +
        "transform) carrying at least one ON VIOLATION DROP ROW rule " +
        "— recompute flows re-derive their violations every run and " +
        "would duplicate the quarantine; WARN keeps rows, FAIL kills " +
        "the update")
    require(flow.kind != "external" || expectations.isEmpty,
      s"table '$name': expectations on an EXTERNAL source are refused " +
        "— the pipeline never writes it, so there is no flow to gate; " +
        "attach the rules to the first managed flow that reads it")
  }

  /** One table's refresh outcome within a run. */
  final case class Refreshed(table: String, flowKind: String,
                             outcome: String, upstreamVersion: Long,
                             versionsProcessed: Long, filesRead: Long,
                             rowsObserved: Long, committedVersion: Long,
                             expectMetrics: String)

  /** Declared PIPELINE DAG query (round 19 — the one structural idea
    * of the reference not yet first-class: its medallion chain is
    * hand-ordered at `etl_pipeline.py:196-201`; DLT declares it). A
    * 3-table graph — bronze (ingest) → silver (row-wise clean WITH
    * expectations: 'P' orders DROP, big prices WARN) → gold
    * (mergeable daily-revenue state) — refreshes TWICE with new data
    * landing between runs through the bronze ingest edge. In-query
    * requires assert the second run was INCREMENTAL by touched-file
    * arithmetic: silver processed exactly ONE new bronze version and
    * read exactly that version's added files (strictly fewer than the
    * bronze total), and gold committed exactly one state delta. A
    * third, replayed run must no-op end to end (idempotency tags).
    * The oracle recomputes the final gold relationally over the
    * union of both batches minus the DROPped rows, so a rescan-shaped
    * refresh still has to be CORRECT and a broken fold hash-fails.
    */
  def pipelineDagQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dag_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val bronzeP = root.toString + "/bronze_orders"
    val silverP = root.toString + "/silver_orders"
    val goldP = root.toString + "/gold_daily"
    val eventsP = root.toString + "/_events"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP,
        Ingest((s, run) =>
          if (run == 1L) ordersOf(s).filter(k % 3 =!= 2)
          else ordersOf(s).filter(k % 3 === 2)),
        statsCols = Seq("o_orderkey")),
      TableDef("silver", silverP,
        Transform("bronze", df => df.select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))),
        expectations = Seq(
          Expectations.expectOrDrop("not_pending",
            "o_orderstatus <> 'P'"),
          Expectations.expect("reasonable_price",
            "o_totalprice <= 400000.0")),
        statsCols = Seq("o_orderkey")),
      TableDef("gold", goldP,
        Aggregate("silver",
          Incremental.dailyState, Incremental.negateDailyState,
          Incremental.mergeDailyState, col("cnt_rows") > 0,
          Seq("o_custkey", "day")))),
      eventLog = Some(eventsP))
    dag.refresh(spark, 1L)
    // new data lands between runs (the run-2 ingest batch), then ONE
    // declarative refresh updates the whole graph incrementally
    val r2 = dag.refresh(spark, 2L)
    // touched-file arithmetic: run 2's silver read EXACTLY bronze
    // v2's added files — never the bronze history
    val bronzeV2Files =
      ManifestTable.versionAddedFileCount(spark, bronzeP, 2L).toLong
    val bronzeTotal = ManifestTable.resolveState(spark, bronzeP,
      ManifestTable.currentVersion(spark, bronzeP).get).files.size.toLong
    val s2 = r2.find(_.table == "silver").get
    require(s2.outcome == "landed" && s2.versionsProcessed == 1L &&
        s2.filesRead == bronzeV2Files && s2.filesRead < bronzeTotal,
      s"silver run-2 refresh must be incremental: processed " +
        s"${s2.versionsProcessed} versions, read ${s2.filesRead} of " +
        s"$bronzeTotal bronze files (v2 added $bronzeV2Files)")
    val g2 = r2.find(_.table == "gold").get
    require(g2.outcome == "merged" && g2.versionsProcessed == 1L,
      s"gold run-2 refresh must fold exactly one upstream version " +
        s"(got ${g2.outcome}/${g2.versionsProcessed})")
    // replayed run: every flow no-ops on its tags
    val r2b = dag.refresh(spark, 2L)
    require(r2b.forall(r =>
        Set("skipped", "no_new_data", "unchanged").contains(r.outcome)),
      s"replayed run must no-op end to end: ${r2b.map(_.outcome)}")
    // the event log recorded every (run, table) outcome
    require(dag.events(spark).count() == 6L,
      "event log must carry 2 runs x 3 tables (the replay no-ops " +
        "its tagged append)")
    Incremental.presentDaily(ManifestTable.read(spark, goldP))
  }

  /** Declared SQL-PIPELINE query (round 19 — the SQL spelling of
    * [[pipelineDagQuery]]'s graph, DLT's `CREATE PIPELINE` shape):
    * ONE statement declares bronze (ledger-driven COPY FROM a raw
    * landing directory) → silver (INCREMENTAL SELECT over each
    * refresh's NEW bronze rows, with EXPECT rules: 'P' orders DROP,
    * big prices WARN) → gold (MATERIALIZED daily-revenue SELECT);
    * `REFRESH PIPELINE` runs it. New FILES land in the source
    * directory between runs — run 2 must ingest exactly those files
    * (copy ledger) and silver must process exactly one new bronze
    * version; a replayed RUN must no-op end to end. Oracle recomputes
    * the final gold relationally over both batches minus the DROPped
    * rows. */
  def pipelineSqlQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagsql_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val src = root.toString + "/landing"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
    // landing batch 1: raw parquet files in a plain directory
    ordersOf(spark).filter(k % 3 =!= 2)
      .coalesce(4).write.mode("append").parquet(src)
    graft.GraftSession.withSqlExtensions(spark) { s =>
      s.sql(
        s"""CREATE PIPELINE dag_sql EVENT LOG AT '$root/_events' AS
            TABLE bronze AT '$root/bronze' AS COPY FROM '$src'
              PATTERN '*.parquet' ;
            TABLE silver AT '$root/silver'
              EXPECT not_pending (o_orderstatus <> 'P')
                ON VIOLATION DROP ROW
              EXPECT reasonable_price (o_totalprice <= 400000.0)
              INCREMENTAL FROM bronze AS
                SELECT o_orderkey, o_custkey, o_orderstatus,
                       o_totalprice, o_orderdate
                FROM bronze ;
            TABLE gold AT '$root/gold' MATERIALIZED FROM silver AS
              SELECT o_custkey,
                     date_trunc('DAY', o_orderdate) AS day,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                       AS DOUBLE) AS daily_revenue,
                     COUNT(*) AS order_count,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                       AS DOUBLE) / COUNT(o_totalprice)
                       AS avg_order_value
              FROM silver
              GROUP BY o_custkey, date_trunc('DAY', o_orderdate)"""
      ).collect()
      s.sql("REFRESH PIPELINE dag_sql RUN 1").collect()
      // new FILES land in the source directory between runs
      val before = new java.io.File(src).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      ordersOf(s).filter(k % 3 === 2)
        .coalesce(4).write.mode("append").parquet(src)
      val newFiles = new java.io.File(src).listFiles()
        .count(f => f.getName.endsWith(".parquet")) - before
      val r2 = s.sql("REFRESH PIPELINE dag_sql RUN 2").collect()
        .map(r => r.getString(0) ->
          ((r.getString(2), r.getLong(4), r.getLong(5)))).toMap
      require(r2("bronze")._1 == "ingested" &&
          r2("bronze")._3 == newFiles.toLong,
        s"run-2 copy must ingest exactly the $newFiles new files, " +
          s"got ${r2("bronze")}")
      require(r2("silver")._1 == "landed" && r2("silver")._2 == 1L,
        s"run-2 silver must process exactly one new bronze version, " +
          s"got ${r2("silver")}")
      // replayed RUN: ledger, watermark, and run tag all no-op
      val r2b = s.sql("REFRESH PIPELINE dag_sql RUN 2").collect()
        .map(_.getString(2)).toSeq
      require(r2b == Seq("no_new_files", "no_new_data", "skipped"),
        s"replayed run must no-op end to end: $r2b")
      s.sql("DROP PIPELINE dag_sql").collect()
      ManifestTable.read(s, root.toString + "/gold")
        .orderBy(col("o_custkey"), col("day"))
    }
  }

  /** Declared COMPILED-AGGREGATE pipeline query (round 19 — the
    * `AGGREGATE FROM ... GROUP BY ... AGG (...)` SQL flow, closing
    * the SQL/Scala asymmetry for sum/count-shaped gold tables): the
    * facts edge ingests the even-key orders in run 1; a DELETE lands
    * on the facts table between runs (an out-of-band retraction —
    * exactly what a full-recompute MATERIALIZED view absorbs for free
    * and an incremental fold must NEGATE exactly); run 2 ingests the
    * odd keys and folds BOTH the delete and the new batch through the
    * compiled decimal-exact state. A replayed run no-ops. Oracle
    * recomputes the surviving aggregate relationally — a drifting
    * negation (double state), a tombstoned group, or a rescan-shaped
    * wrong fold all hash-fail. */
  def pipelineAggQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagagg_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val factsP = root.toString + "/facts"
    val goldP = root.toString + "/gold_rev"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dag = Dag(Seq(
      TableDef("facts", factsP, Ingest((s, run) =>
        if (run == 1L) ordersOf(s).filter(k % 2 === 0)
        else ordersOf(s).filter(k % 2 === 1)),
        statsCols = Seq("o_orderkey")),
      TableDef("gold", goldP, aggregateOf("facts",
        groupBy = Seq("o_custkey"),
        aggs = Seq(("sum", "o_totalprice", "revenue"),
          ("count", "*", "n"))))))
    dag.refresh(spark, 1L)
    // out-of-band RETRACTION between runs: a keyed delete on facts —
    // the fold must negate those rows' contributions bit-exactly
    ManifestTable.deleteWhere(spark, factsP, k % 10 === 0)
    val r2 = dag.refresh(spark, 2L)
    require(r2.map(_.outcome) == Seq("landed", "merged"),
      s"run 2 must ingest and fold: ${r2.map(_.outcome)}")
    val r2b = dag.refresh(spark, 2L)
    require(r2b.map(_.outcome) == Seq("skipped", "no_new_data"),
      s"replayed run must no-op: ${r2b.map(_.outcome)}")
    ManifestTable.read(spark, goldP)
      .select(col("o_custkey"),
        col("revenue").cast("double").as("revenue"), col("n"))
      .orderBy(col("o_custkey"))
  }

  /** Declared PIPELINE CDC query (round 19 — the [[Cdc]] flow's own
    * oracle row): a 2-table graph — feed (ingest of CDC events) →
    * dim (APPLY CHANGES as a pipeline edge) — refreshed twice. The
    * target is CREATED by the first refresh (DLT's contract; no
    * initialize call anywhere), the in-batch seq race resolves in
    * run 1, run 2 delivers a delete, a LATE update (pruned by the
    * `_seq` high-water), a fresh update, and a new key; a replayed
    * refresh must no-op. Oracle recomputes the surviving dimension
    * per key class. */
  def pipelineCdcQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagcdc_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val feedP = root.toString + "/cdc_feed"
    val dimP = root.toString + "/dim_orders"
    val k = col("o_orderkey")
    def ev(s: SparkSession, filter: Column, delta: Double, seq: Long,
           del: Boolean) = graft.Tables.orders(s, sfDir)
      .filter(filter).select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + delta).as("o_totalprice"),
        lit(seq).as("change_seq"), lit(del).as("is_delete"))
    def batchOf(s: SparkSession, run: Long): DataFrame =
      if (run == 1L)
        ev(s, k % 5 === 0, 10.0, 1L, del = false)
          .unionByName(ev(s, k % 5 === 1, 111.0, 1L, del = false))
          .unionByName(ev(s, k % 5 === 1, 555.0, 5L, del = false))
          .unionByName(ev(s, k % 5 === 2, 333.0, 3L, del = false))
      else
        ev(s, k % 5 === 0, 0.0, 9L, del = true)
          .unionByName(ev(s, k % 5 === 1, 222.0, 2L, del = false))
          .unionByName(ev(s, k % 5 === 2, 777.0, 7L, del = false))
          .unionByName(ev(s, k % 5 === 3, 444.0, 4L, del = false))
    val dag = Dag(Seq(
      TableDef("feed", feedP, Ingest(batchOf)),
      TableDef("dim", dimP, Cdc("feed", "o_orderkey", "change_seq",
        deleteWhen = Some("is_delete")),
        statsCols = Seq("o_orderkey"))))
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    val r2b = dag.refresh(spark, 2L)
    require(r2b.map(_.outcome) == Seq("skipped", "no_new_data"),
      s"replayed CDC refresh must no-op: ${r2b.map(_.outcome)}")
    ManifestTable.read(spark, dimP).orderBy(col("o_orderkey"))
  }

  /** Declared FULL-REFRESH pipeline query (round 19 — DLT's second
    * button, selective form): bronze (ingest) → silver (row-wise) →
    * gold (compiled sum/count fold) refreshes twice incrementally;
    * THEN the quality bar moves — a persisted DROP expectation lands
    * on silver AFTER its history did (`ALTER TABLE ... ADD
    * EXPECTATION` machinery) — and a SELECTIVE full refresh rebuilds
    * ONLY silver under the now-current rules while gold follows
    * INCREMENTALLY in the same pass, folding the rebuild as exact
    * retractions (negation-exact decimal state; fully-retracted
    * customers leave no tombstone). In-query requires assert the
    * rebuild's audit row (recomputed, whole-upstream file
    * arithmetic), the incremental gold outcome (merged, not
    * recomputed), and the retroactive drop (silver shrank). Oracle
    * recomputes the surviving aggregate over ALL orders minus the
    * dropped class — an un-applied rule, a drifting negation, or a
    * tombstoned group hash-fails. */
  def pipelineFullQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagfull_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val bronzeP = root.toString + "/bronze"
    val silverP = root.toString + "/silver"
    val goldP = root.toString + "/gold"
    val eventsP = root.toString + "/_events"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((s, run) =>
        if (run == 1L) ordersOf(s).filter(k % 3 =!= 2)
        else if (run == 2L) ordersOf(s).filter(k % 3 === 2)
        else ordersOf(s).filter(lit(false))),
        statsCols = Seq("o_orderkey")),
      TableDef("silver", silverP,
        Transform("bronze", df => df.select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))),
        statsCols = Seq("o_orderkey")),
      TableDef("gold", goldP, aggregateOf("silver",
        groupBy = Seq("o_custkey"),
        aggs = Seq(("sum", "o_totalprice", "revenue"),
          ("count", "*", "n"))))),
      eventLog = Some(eventsP))
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    // the quality bar moves AFTER history landed: incremental refresh
    // correctly never re-reads history, so the rule reaches it only
    // through a rebuild
    ManifestTable.addExpectation(spark, silverP, "not_pending",
      "o_orderstatus <> 'P'", onViolation = "drop")
    val before = ManifestTable.read(spark, silverP).count()
    val bronzeFiles = ManifestTable.resolveState(spark, bronzeP,
      ManifestTable.currentVersion(spark, bronzeP).get).files.size.toLong
    val r3 = dag.refreshFull(spark, 3L, tables = Set("silver"))
    val s3 = r3.find(_.table == "silver").get
    require(s3.outcome == "recomputed" && s3.filesRead >= bronzeFiles,
      s"silver must rebuild from the whole upstream (got ${s3.outcome}" +
        s", read ${s3.filesRead} of $bronzeFiles bronze files)")
    val g3 = r3.find(_.table == "gold").get
    require(g3.outcome == "merged",
      s"gold must fold the rebuild INCREMENTALLY (exact retraction), " +
        s"got '${g3.outcome}'")
    val after = ManifestTable.read(spark, silverP).count()
    require(after < before,
      s"the persisted DROP rule must apply retroactively through the " +
        s"rebuild ($before rows before, $after after)")
    // the event log carries 2 idempotent runs + the imperative full
    // pass, 3 tables each
    require(dag.events(spark).count() == 9L,
      "event log must carry 3 passes x 3 tables")
    ManifestTable.read(spark, goldP)
      .select(col("o_custkey"),
        col("revenue").cast("double").as("revenue"), col("n"))
      .orderBy(col("o_custkey"))
  }

  /** Declared QUARANTINE pipeline query (round 19 — DLT's documented
    * invalid-record pattern as a first-class verb): rows a flow's
    * DROP rules filter land in a QUARANTINE table instead of
    * vanishing — triage without blocking the pipeline. The graph
    * ingests all orders over two runs; silver's DROP rule rejects 'P'
    * orders, which land in the quarantine table tagged with the rule
    * they broke and the run that rejected them, exactly-once (the
    * quarantine append commits BEFORE the main one under a derived
    * tag, so a replayed run re-derives only no-ops — require-asserted
    * by a third replay run). Oracle recomputes the three-way
    * classification (kept / quarantined-by-run) over all orders. */
  def pipelineQuarantineQuery(spark: SparkSession,
                              sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagquar_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val bronzeP = root.toString + "/bronze"
    val silverP = root.toString + "/silver"
    val quarP = root.toString + "/silver_quarantine"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val dag = Dag(Seq(
      TableDef("bronze", bronzeP, Ingest((s, run) =>
        if (run == 1L) ordersOf(s).filter(k % 2 === 0)
        else if (run == 2L) ordersOf(s).filter(k % 2 === 1)
        else ordersOf(s).filter(lit(false))),
        statsCols = Seq("o_orderkey")),
      TableDef("silver", silverP,
        Transform("bronze", df => df),
        expectations = Seq(Expectations.expectOrDrop("not_pending",
          "o_orderstatus <> 'P'")),
        statsCols = Seq("o_orderkey"),
        quarantineAt = Some(quarP))))
    dag.refresh(spark, 1L)
    dag.refresh(spark, 2L)
    val qCount = ManifestTable.read(spark, quarP).count()
    // replayed run: the quarantine append no-ops on its derived tag
    dag.refresh(spark, 2L)
    require(ManifestTable.read(spark, quarP).count() == qCount,
      "a replayed run must not re-quarantine (the -q tag no-ops)")
    val q = ManifestTable.read(spark, quarP)
      .select(col("o_orderkey"), col("_violated"), col("_run_id"))
    val s = ManifestTable.read(spark, silverP)
      .select(col("o_orderkey"), lit("kept").as("_violated"),
        lit(0L).as("_run_id"))
    q.unionByName(s).orderBy(col("o_orderkey"))
  }

  /** Declared SNAPSHOT-CDC pipeline query (round 19 — DLT's
    * `apply_changes_from_snapshot` as a declarative edge): an
    * EXTERNAL source table is REPLACED out-of-band between refreshes
    * — snapshot 1 holds the %4∈{0,1,2} orders, snapshot 2 the
    * %4∈{1,2,3} orders with the %4=2 prices doubled — and the
    * dimension follows by full-outer diff at snapshot sequence = the
    * upstream version: %4=0 deletes, %4=1 stays UNTOUCHED (its `_seq`
    * stays 1 — the hash-gated proof unchanged keys emit nothing and
    * the merge is O(changed)), %4=2 updates, %4=3 inserts (both at
    * `_seq` 2). In-query requires assert one atomic commit per
    * applied snapshot and that a replayed refresh no-ops on the
    * version watermark. Oracle recomputes the surviving dimension
    * with its per-class sequence. */
  def pipelineSnapshotQuery(spark: SparkSession,
                            sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagsnap_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val srcP = root.toString + "/src"
    val dimP = root.toString + "/dim"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val dag = Dag(Seq(
      TableDef("src", srcP, External()),
      TableDef("dim", dimP, SnapshotCdc("src", "o_orderkey"),
        statsCols = Seq("o_orderkey"))))
    ManifestTable.write(ordersOf(spark).filter(k % 4 < 3), srcP): Unit
    dag.refresh(spark, 1L)
    val v1 = ManifestTable.currentVersion(spark, dimP).get
    ManifestTable.write(ordersOf(spark).filter(k % 4 > 0)
      .withColumn("o_totalprice",
        when(k % 4 === 2, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice"))), srcP): Unit
    val r2 = dag.refresh(spark, 2L)
    require(r2.find(_.table == "dim").get.outcome == "applied",
      "snapshot 2 must apply")
    val v2 = ManifestTable.currentVersion(spark, dimP).get
    require(v2 == v1 + 1L,
      s"each applied snapshot is ONE atomic merge commit (dim went " +
        s"$v1 -> $v2)")
    val r3 = dag.refresh(spark, 3L)
    require(r3.find(_.table == "dim").get.outcome == "no_new_data",
      "a replayed refresh must no-op on the version watermark")
    ManifestTable.read(spark, dimP)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("_seq"))
      .orderBy(col("o_orderkey"))
  }

  /** Declared CONTINUOUS pipeline query (round 19 — DLT's second
    * execution mode): the %3=0 orders land BEFORE start (the
    * bootstrap pass catches them), the %3=1 batch lands WHILE the
    * graph runs (src's commit propagates src → silver → gold through
    * the feed subscriptions — require-asserted by silver's version
    * arithmetic), the %3=2 batch lands while STOPPED and a restart on
    * the same checkpoints catches up. Silver's DROP expectation gates
    * identically in both modes (shared `refreshOne` verb); an idle
    * drain after the restart must commit nothing. Oracle recomputes
    * the per-(customer, status) gold over all non-'P' orders — a
    * dropped batch, a double-applied replay, or an unguarded gate
    * hash-fails. */
  def pipelineContinuousQuery(spark: SparkSession,
                              sfDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      "graft_dagcont_" + Integer.toHexString(sfDir.hashCode))
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(root)
    val srcP = root.toString + "/src"
    val silverP = root.toString + "/silver"
    val goldP = root.toString + "/gold"
    val ckpt = root.toString + "/_ckpt"
    val k = col("o_orderkey")
    def ordersOf(s: SparkSession) = graft.Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val dag = Dag(Seq(
      TableDef("src", srcP, External()),
      TableDef("silver", silverP, Transform("src", df => df),
        expectations = Seq(Expectations.expectOrDrop("not_pending",
          "o_orderstatus <> 'P'")),
        statsCols = Seq("o_orderkey")),
      TableDef("gold", goldP, aggregateOf("silver",
        groupBy = Seq("o_custkey", "o_orderstatus"),
        aggs = Seq(("sum", "o_totalprice", "revenue"),
          ("count", "*", "n"))))))
    ManifestTable.write(ordersOf(spark).filter(k % 3 === 0), srcP): Unit
    val qs = dag.continuous(spark, ckpt)
    try {
      require(ManifestTable.currentVersion(spark, silverP).contains(1L),
        "the bootstrap pass must catch the pre-start batch")
      // lands WHILE RUNNING: the commit must flow through the graph
      ManifestTable.append(ordersOf(spark).filter(k % 3 === 1), srcP): Unit
      qs.foreach(_.processAllAvailable())
      require(ManifestTable.currentVersion(spark, silverP).contains(2L),
        "the running stream (not the bootstrap) must apply batch 2 as " +
          "one commit")
    } finally qs.foreach(_.stop())
    // lands while STOPPED; the restart resumes on the same checkpoints
    ManifestTable.append(ordersOf(spark).filter(k % 3 === 2), srcP): Unit
    val qs2 = dag.continuous(spark, ckpt)
    try {
      qs2.foreach(_.processAllAvailable())
      val vGold = ManifestTable.currentVersion(spark, goldP).get
      qs2.foreach(_.processAllAvailable())
      require(ManifestTable.currentVersion(spark, goldP).get == vGold,
        "an idle drain must commit nothing")
    } finally qs2.foreach(_.stop())
    ManifestTable.read(spark, goldP)
      .select(col("o_custkey"), col("o_orderstatus"),
        col("revenue").cast("double").as("revenue"), col("n"))
      .orderBy(col("o_custkey"), col("o_orderstatus"))
  }

  /** Topological order of `defs` (Kahn), refusing unknown inputs,
    * duplicate names, and cycles at CONSTRUCTION time. */
  private[pipeline] def topoSort(defs: Seq[TableDef]): Seq[TableDef] = {
    val byName = defs.map(d => d.name -> d).toMap
    require(byName.size == defs.size,
      s"duplicate table names: ${defs.map(_.name).diff(byName.keys.toSeq)}")
    defs.foreach(d => d.flow.inputs.foreach(i =>
      require(byName.contains(i),
        s"table '${d.name}' depends on undeclared table '$i'")))
    val indeg = scala.collection.mutable.Map(
      defs.map(d => d.name -> d.flow.inputs.size): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[TableDef]
    val ready = scala.collection.mutable.Queue(
      defs.filter(_.flow.inputs.isEmpty).map(_.name).sorted: _*)
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += byName(n)
      defs.filter(_.flow.inputs.contains(n)).foreach { d =>
        indeg(d.name) -= byName(d.name).flow.inputs.count(_ == n)
        if (indeg(d.name) == 0) ready += d.name
      }
    }
    require(out.size == defs.size,
      s"pipeline graph has a cycle among: " +
        defs.map(_.name).diff(out.map(_.name).toSeq).mkString(", "))
    out.toSeq
  }
}

final case class Dag(defs: Seq[Dag.TableDef],
                     eventLog: Option[String] = None) {
  import Dag._

  /** Tables in refresh order — validated at construction. */
  val ordered: Seq[TableDef] = topoSort(defs)
  private val pathOf: Map[String, String] =
    defs.map(d => d.name -> d.path).toMap

  /** The flow's gate: expectations (when declared) plus an
    * always-attached row counter — metrics materialize with the
    * flow's own write action, zero extra scans. */
  private def gateFlow(df: DataFrame, d: TableDef, obsName: String)
      : (DataFrame, Observation, Seq[String]) =
    if (d.expectations.isEmpty) {
      val obs = new Observation(obsName)
      (df.observe(obs, count(lit(1)).as("rows_observed")), obs, Nil)
    } else {
      val (gated, obs) = Expectations.gate(df, d.expectations, obsName)
      (gated, obs, d.expectations.map(_.name))
    }

  private def metricsJson(obs: Observation,
                          names: Seq[String]): (Long, String) = {
    val rows = obs.get.get("rows_observed") match {
      case Some(v: Number) => v.longValue(); case _ => 0L
    }
    if (names.isEmpty) (rows, null)
    else {
      val m = Expectations.metricsOf(obs, names)
      (rows, names.map { n =>
        val (v, p) = m(n)
        s""""$n":{"violated":$v,"passed":$p}"""
      }.mkString("{", ",", "}"))
    }
  }

  /** Land the batch's DROP-rule violations in the flow's quarantine
    * table BEFORE the main commit, under `<mainTag>-q`: a crash
    * between the two commits replays only the main one (the
    * quarantine append no-ops on its tag), so the pair is
    * exactly-once without a transaction spanning two tables. Each row
    * carries `_violated` (the drop rules it broke) and `_run_id`. One
    * extra pass over the batch — the flows' inputs are file-backed
    * reads, so the pass re-reads the same data (documented cost; the
    * gated main write stays one fused scan). A VIOLATION-FREE batch
    * commits NOTHING: the emptiness probe costs the same single pass
    * the empty append would, and skipping is idempotent by vacuity
    * (a replay re-derives the same empty set) — without it every
    * clean refresh would grow the quarantine table by one empty
    * version, unbounded churn on an always-clean pipeline. */
  private def quarantineBatch(spark: SparkSession, d: TableDef,
                              batch: DataFrame, runId: Long,
                              mainTag: String): Unit =
    d.quarantineAt.foreach { qp =>
      // cached: the emptiness probe and the append must not each
      // re-filter the batch (violations are small — the kept side
      // never caches)
      val bad = Expectations.quarantined(batch, d.expectations)
        .withColumn("_run_id", lit(runId)).cache()
      try {
        if (!bad.isEmpty)
          ManifestTable.appendIdempotent(bad, qp,
            tag = s"$mainTag-q"): Unit
      } finally bad.unpersist(blocking = false): Unit
    }

  /** Highest upstream version a tagged incremental flow has applied
    * (the `<prefix><N>` tag suffixes on the flow's OWN table — the
    * same watermark rule as the feed fold's). */
  private def tagWater(spark: SparkSession, path: String,
                       prefix: String): Long =
    ManifestTable.currentVersion(spark, path)
      .map(v => ManifestTable.resolveState(spark, path, v).tags.keys
        .filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix).toLong))
      .getOrElse(Iterable.empty)
      .foldLeft(0L)(math.max)

  /** Change rows of every `upPath` version in (water, cur] plus the
    * (versions, filesRead) audit — the shared incremental read of the
    * Transform and Cdc flows. Refuses non-append upstream commits
    * (both flows are row/event shaped and cannot retract). */
  private def newRows(spark: SparkSession, flowName: String, of: String,
                      upPath: String, water: Long, cur: Long)
      : (DataFrame, Long, Long) = {
    val allVs = ManifestTable.versions(spark, upPath)
    require(water == 0L || allVs.isEmpty || water + 1 >= allVs.head,
      s"flow '$flowName' resume point $water of '$of' is out of " +
        "retention — re-bootstrap the flow")
    val vs = allVs.filter(v => v > water && v <= cur)
    val batch = vs.map { v =>
      // vacuumed-history bootstrap: the oldest surviving version of a
      // fresh flow reads as a snapshot of inserts (the feed source's
      // rule)
      val bootstrap = water == 0L && v == vs.head && v != 1L
      require(bootstrap || v == 1L ||
          ManifestTable.commitAddsOnly(spark, upPath, v),
        s"row-wise flow '$flowName' saw a NON-APPEND commit v$v on " +
          s"'$of' — a row-wise flow cannot retract; use an Aggregate " +
          "flow or a Materialize")
      if (bootstrap) ManifestTable.readVersion(spark, upPath, v)
      else ManifestTable.changesForVersion(spark, upPath, v)
        .drop("_change")
    }.reduce(_.unionByName(_))
    val filesRead =
      vs.map(ManifestTable.versionAddedFileCount(spark, upPath, _))
        .sum.toLong
    (batch, vs.size.toLong, filesRead)
  }

  /** Run ONE refresh pass over the whole graph in topological order.
    * Idempotent per `runId`: every commit carries a tag derived from
    * the run or the upstream version range, so replaying a run (or
    * resuming a crashed one) re-derives only no-ops. Returns one
    * [[Dag.Refreshed]] per table and appends them to the event log.
    *
    * FAILURE containment (DLT's reading): a failing flow stops the
    * graph — downstream flows do NOT run against a half-refreshed
    * upstream — but everything already committed STAYS committed,
    * the event log records every completed flow plus a `failed` row
    * for the broken one (error message in its metrics column), and a
    * re-refresh with the SAME run id resumes: completed flows no-op
    * on their tags, only the failed flow and its downstream re-run. */
  def refresh(spark: SparkSession, runId: Long): Seq[Refreshed] =
    refreshPass(spark, runId, full = Set.empty)

  /** CONTINUOUS mode (DLT's second EXECUTION mode, the sibling of the
    * triggered [[refresh]]): every watermark-driven derived edge —
    * Transform, Cdc, Aggregate — becomes a long-running Structured
    * Streaming query subscribed to its upstream's change feed
    * ([[graft.streaming.TableFeedSource]]), so upstream commits flow
    * through the graph within a trigger interval instead of waiting
    * for the next refresh call. Cascades compose: silver's commit IS
    * gold's wake-up.
    *
    * The feed subscription is ONLY the change-detection trigger — its
    * rows are never materialized (foreachBatch discards the frame
    * unread, so the micro-batch costs offset bookkeeping, not a
    * scan). The WORK each wake-up runs is the SAME incremental verb
    * the triggered mode runs for that edge, against the same
    * `dag-<name>-v<version>` watermark tags. That identity is the
    * point: triggered and continuous semantics cannot drift, replays
    * no-op on the shared tags, and the two modes COMPOSE — a stopped
    * continuous pipeline can be caught up with [[refresh]] and
    * vice versa (DLT's mode switch).
    *
    * Before subscribing, one bootstrap pass runs each edge's
    * incremental verb synchronously in topological order (DLT's
    * initial update): targets get created and pending upstream
    * versions apply, so every subscription opens on an existing
    * table. Source edges (Ingest / CopyFrom / External) do not run
    * continuously — land their data out-of-band or with a triggered
    * refresh. Materialize and SnapshotCdc edges REFUSE: neither is
    * watermark-driven (a full recompute / snapshot diff per upstream
    * commit would be O(table) per trigger) — refresh them on a
    * schedule, DLT's materialized-view contract.
    *
    * Failure containment is per-edge: a failing flow kills ITS query
    * (the streaming engine surfaces the cause); upstream edges keep
    * running, downstream edges idle on a feed that no longer
    * advances. Event-log rows are not written per micro-batch —
    * observability in this mode is the streaming progress API plus
    * the per-commit tags in each table's own history.
    *
    * Returns the started queries in topological order; the caller
    * owns their lifecycle (`processAllAvailable`/`stop`, or
    * `awaitTermination`). Checkpoints live under
    * `<checkpointRoot>/<table>` — reuse the same root to resume. */
  def continuous(spark: SparkSession, checkpointRoot: String)
      : Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
    defs.foreach(d => require(
      d.flow.kind != "materialize" && d.flow.kind != "snapshot_cdc",
      s"table '${d.name}' (${d.flow.kind}) cannot run continuously — " +
        "a full recompute or snapshot diff per upstream commit is " +
        "O(table) per trigger; refresh it on a schedule (triggered " +
        "mode) and run the watermark-driven edges continuously"))
    val cont = ordered.filter(d =>
      Set("transform", "cdc", "aggregate").contains(d.flow.kind))
    require(cont.nonEmpty,
      "continuous mode needs at least one Transform/Cdc/Aggregate edge")
    // bootstrap (DLT's initial update): create targets, catch up
    cont.foreach(d => refreshOne(spark, 0L, d): Unit)
    val root = checkpointRoot.stripSuffix("/")
    val started = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.streaming.StreamingQuery]
    try {
      cont.foreach { d =>
        started += graft.streaming.TableFeedSource
          .readStream(spark, pathOf(d.flow.inputs.head))
          .writeStream
          .queryName(s"dag-${d.name}")
          .option("checkpointLocation", s"$root/${d.name}")
          .foreachBatch { (_: DataFrame, _: Long) =>
            refreshOne(spark, 0L, d): Unit
          }
          .start()
      }
      started.toSeq
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a failed Nth start must not leak the first N-1 as running,
        // untracked queries
        started.foreach(q => try q.stop() catch {
          case scala.util.control.NonFatal(_) => ()
        })
        throw e
    }
  }

  /** The table names FULL REFRESH rebuilds by default: every DERIVED
    * table (Transform / Aggregate / Cdc / Materialize). Source edges
    * (Ingest, CopyFrom) are excluded — they are their own source of
    * truth (a run-driven batch or an already-ingested file is not
    * re-derivable; wiping them would be data loss, the hazard DLT
    * documents for full refresh against limited-retention sources). */
  def derivedTables: Set[String] =
    defs.filterNot(d =>
      Set("ingest", "copy", "external").contains(d.flow.kind))
      .map(_.name).toSet

  /** FULL REFRESH (DLT's second button, optionally SELECTIVE): the
    * named tables — default: every derived table — REBUILD from their
    * upstreams' CURRENT content under the CURRENT rules (flow logic,
    * flow-level AND table-persisted expectations), while every other
    * table refreshes incrementally in the same topological pass.
    * That retroactivity is the verb's whole point: an expectation or
    * transform changed AFTER history landed applies to the history
    * only through a rebuild — the incremental path, correctly, never
    * re-reads it. Each rebuild is ONE atomic overwrite carrying the
    * flow's watermark tag at the upstream's current version, so the
    * next incremental refresh resumes exactly past the rebuild
    * (downstream flows may consume the rebuild incrementally — the
    * Aggregate fold absorbs an upstream rewrite as exact
    * retractions). Unlike [[refresh]], a full refresh is IMPERATIVE:
    * replaying it rebuilds again (recompute is the request, not a
    * landing to deduplicate); the failure-containment contract is
    * [[refresh]]'s. Naming a source edge (Ingest / CopyFrom) refuses
    * loudly. Cdc edges rebuild per [[ApplyChanges.rebuildScd1]] /
    * [[ApplyChanges.rebuildScd2]] (SCD2 history collapses to the
    * rebuilt open slice — documented there). */
  def refreshFull(spark: SparkSession, runId: Long,
                  tables: Set[String] = Set.empty): Seq[Refreshed] = {
    val full = if (tables.isEmpty) derivedTables else tables
    val known = defs.map(_.name).toSet
    require((full -- known).isEmpty,
      s"full refresh names undeclared tables: " +
        s"${(full -- known).toSeq.sorted.mkString(", ")}")
    full.foreach { t =>
      val k = defs.find(_.name == t).get.flow.kind
      require(k != "ingest" && k != "copy" && k != "external",
        s"full refresh of source edge '$t' ($k) refused — a " +
          "run-driven or ledger-driven source edge is its own source " +
          "of truth (and an EXTERNAL source is not the pipeline's to " +
          "write at all); past batches cannot be re-derived, so a " +
          "rebuild is data loss (DLT's limited-retention-source " +
          "hazard). Name only derived tables, or omit TABLES for all " +
          "of them")
    }
    refreshPass(spark, runId, full)
  }

  private def refreshPass(spark: SparkSession, runId: Long,
                          full: Set[String]): Seq[Refreshed] = {
    val results = scala.collection.mutable.ArrayBuffer.empty[Refreshed]
    var failure: Option[Throwable] = None
    val it = ordered.iterator
    while (it.hasNext && failure.isEmpty) {
      val d = it.next()
      try results += (if (full.contains(d.name))
        refreshOneFull(spark, runId, d)
      else refreshOne(spark, runId, d))
      catch {
        case scala.util.control.NonFatal(e) =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replace("\\", "\\\\").replace("\"", "\\\"")
            .replaceAll("[\\n\\r\\t]", " ").take(300)
          results += Refreshed(d.name, d.flow.kind, "failed", -1L, 0L,
            0L, 0L,
            ManifestTable.currentVersion(spark, d.path).getOrElse(-1L),
            s"""{"error":"$msg"}""")
          failure = Some(e)
      }
    }
    logEvents(spark, runId, results.toSeq, failed = failure.isDefined,
      fullRefresh = full.nonEmpty)
    failure.foreach(e => throw new IllegalStateException(
      s"pipeline refresh (run $runId) failed at table " +
        s"'${results.last.table}' — completed flows are committed, " +
        "downstream flows did not run, the event log records the " +
        "attempt; fix and re-refresh with the SAME run id (completed " +
        "flows no-op on their tags)", e))
    results.toSeq
  }

  private def logEvents(spark: SparkSession, runId: Long,
                        rs: Seq[Refreshed], failed: Boolean,
                        fullRefresh: Boolean = false): Unit =
    eventLog.foreach { ep =>
      import spark.implicits._
      val df = rs.map(r => (runId, r.table, r.flowKind,
          r.outcome, r.upstreamVersion, r.versionsProcessed,
          r.filesRead, r.rowsObserved, r.committedVersion,
          r.expectMetrics))
        .toDF("run_id", "table", "flow", "outcome",
          "upstream_version", "versions_processed", "files_read",
          "rows_observed", "committed_version", "expect_metrics")
      // successful runs log idempotently under the run tag (a
      // replayed all-no-op run must not re-append); FAILED attempts
      // and FULL refreshes log unconditionally — each is a distinct
      // imperative event (a full refresh may legitimately reuse a run
      // id whose incremental pass already logged), and the run tag
      // must stay free for a failed run's eventual successful retry
      if (failed || fullRefresh) ManifestTable.append(df, ep): Unit
      else ManifestTable.appendIdempotent(df, ep,
        tag = s"dag-events-run$runId"): Unit
    }

  private def refreshOne(spark: SparkSession, runId: Long,
                         d: TableDef): Refreshed = {
      d.flow match {
        case Ingest(batchOf) =>
          val tag = s"dag-${d.name}-run$runId"
          ManifestTable.committedVersionOfTag(spark, d.path, tag) match {
            case Some(v) =>
              Refreshed(d.name, "ingest", "skipped", -1L, 0L, 0L, 0L,
                v, null)
            case None =>
              val batch = batchOf(spark, runId)
              quarantineBatch(spark, d, batch, runId, tag)
              val (gated, obs, names) = gateFlow(batch, d, s"$tag-obs")
              val exists =
                ManifestTable.currentVersion(spark, d.path).isDefined
              val v =
                if (exists) ManifestTable.append(gated, d.path,
                  statsCols = d.statsCols, tag = Some(tag))
                else ManifestTable.write(gated, d.path,
                  statsCols = d.statsCols, tag = Some(tag))
              val (rows, mj) = metricsJson(obs, names)
              Refreshed(d.name, "ingest", "landed", -1L, 0L, 0L, rows,
                v, mj)
          }

        case CopyFrom(dir, fmtS, pat) =>
          // DLT creates the target: first refresh declares it EMPTY
          // with the source's schema, then the ledger-driven copy
          // ingests everything new
          if (ManifestTable.currentVersion(spark, d.path).isEmpty) {
            val empty = (fmtS.toLowerCase match {
              case "parquet" => spark.read.parquet(dir)
              case "csv" => spark.read.option("header", "true")
                .option("inferSchema", "true").csv(dir)
              case "json" => spark.read.json(dir)
              case other => throw new IllegalArgumentException(
                s"CopyFrom supports parquet/csv/json, got '$other'")
            }).limit(0)
            ManifestTable.write(empty, d.path,
              statsCols = d.statsCols): Unit
          }
          val (v, n) =
            ManifestTable.copyInto(spark, d.path, dir, fmtS, pat)
          Refreshed(d.name, "copy",
            if (n == 0) "no_new_files" else "ingested",
            -1L, 0L, n.toLong, 0L, v, null)

        case Transform(of, rowFlow) =>
          val upPath = pathOf(of)
          val prefix = s"dag-${d.name}-v"
          val cur = ManifestTable.currentVersion(spark, upPath)
            .getOrElse(0L)
          val water = tagWater(spark, d.path, prefix)
          if (cur <= water)
            Refreshed(d.name, "transform", "no_new_data", cur, 0L, 0L,
              0L, ManifestTable.currentVersion(spark, d.path)
                .getOrElse(-1L), null)
          else {
            val (batch, nVs, filesRead) =
              newRows(spark, d.name, of, upPath, water, cur)
            val flowed = rowFlow(batch)
            quarantineBatch(spark, d, flowed, runId, s"$prefix$cur")
            val (gated, obs, names) =
              gateFlow(flowed, d, s"$prefix$cur-obs")
            val v = ManifestTable.append(gated, d.path,
              statsCols = d.statsCols, tag = Some(s"$prefix$cur"))
            val (rows, mj) = metricsJson(obs, names)
            Refreshed(d.name, "transform", "landed", cur, nVs,
              filesRead, rows, v, mj)
          }

        case Cdc(of, key, seqBy, delWhen, tracked) =>
          val upPath = pathOf(of)
          val prefix = s"dag-${d.name}-v"
          val cur = ManifestTable.currentVersion(spark, upPath)
            .getOrElse(0L)
          val water = tagWater(spark, d.path, prefix)
          if (cur <= water)
            Refreshed(d.name, "cdc", "no_new_data", cur, 0L, 0L, 0L,
              ManifestTable.currentVersion(spark, d.path)
                .getOrElse(-1L), null)
          else {
            val (batch, nVs, filesRead) =
              newRows(spark, d.name, of, upPath, water, cur)
            // DLT creates the target: first refresh initializes an
            // EMPTY dimension with the feed's business schema
            if (ManifestTable.currentVersion(spark, d.path).isEmpty) {
              val biz = batch.columns.filterNot(c =>
                c == seqBy || delWhen.contains(c))
              val empty = batch.select(biz.map(col).toSeq: _*).limit(0)
              if (tracked.isEmpty)
                ApplyChanges.initializeScd1(empty, d.path, 0L,
                  statsCols = d.statsCols): Unit
              else
                ApplyChanges.initializeScd2(empty, d.path, ts = 0L,
                  seq0 = 0L, statsCols = d.statsCols): Unit
            }
            val (gated, obs, names) =
              gateFlow(batch, d, s"$prefix$cur-obs")
            // SCD2 history granularity is the REFRESH (logical time =
            // the upstream version applied), DLT's per-flow-update
            // reading; sequence ordering inside stays per-event
            val v = tracked match {
              case None =>
                ApplyChanges.applyScd1(spark, d.path, key, gated,
                  seqBy, delWhen, tag = Some(s"$prefix$cur"))
              case Some(tr) =>
                ApplyChanges.applyScd2(spark, d.path, key, gated, tr,
                  seqBy, ts = cur, tag = Some(s"$prefix$cur"),
                  deleteWhen = delWhen)
            }
            val (rows, mj) = metricsJson(obs, names)
            Refreshed(d.name, "cdc", "applied", cur, nVs, filesRead,
              rows, v, mj)
          }

        case External() =>
          Refreshed(d.name, "external", "source", -1L, 0L, 0L, 0L,
            ManifestTable.currentVersion(spark, d.path).getOrElse(-1L),
            null)

        case SnapshotCdc(of, key, tracked) =>
          val upPath = pathOf(of)
          val prefix = s"dag-${d.name}-v"
          val cur = ManifestTable.currentVersion(spark, upPath)
            .getOrElse(0L)
          val water = tagWater(spark, d.path, prefix)
          if (cur <= water)
            Refreshed(d.name, "snapshot_cdc", "no_new_data", cur, 0L,
              0L, 0L, ManifestTable.currentVersion(spark, d.path)
                .getOrElse(-1L), null)
          else {
            val snap = ManifestTable.read(spark, upPath)
            // DLT creates the target: a snapshot feed is ALL business
            // columns (no sequence/delete controls)
            if (ManifestTable.currentVersion(spark, d.path).isEmpty) {
              if (tracked.isEmpty)
                ApplyChanges.initializeScd1(snap.limit(0), d.path, 0L,
                  statsCols = d.statsCols): Unit
              else
                ApplyChanges.initializeScd2(snap.limit(0), d.path,
                  ts = 0L, seq0 = 0L, statsCols = d.statsCols): Unit
            }
            val (gated, obs, names) =
              gateFlow(snap, d, s"$prefix$cur-obs")
            // the upstream version IS the snapshot sequence (and the
            // SCD2 logical time) — DLT's apply_changes_from_snapshot
            val v = tracked match {
              case None =>
                ApplyChanges.applyScd1FromSnapshot(spark, d.path, key,
                  gated, snapshotSeq = cur, tag = Some(s"$prefix$cur"))
              case Some(tr) =>
                ApplyChanges.applyScd2FromSnapshot(spark, d.path, key,
                  gated, tr, snapshotSeq = cur, ts = cur,
                  tag = Some(s"$prefix$cur"))
            }
            // a snapshot diff honestly reads the whole upstream
            val filesRead = ManifestTable
              .resolveState(spark, upPath, cur).files.size.toLong
            val (rows, mj) = metricsJson(obs, names)
            Refreshed(d.name, "snapshot_cdc", "applied", cur,
              cur - water, filesRead, rows, v, mj)
          }

        case Aggregate(of, stateOf, negate, mergeF, live, keys) =>
          val upPath = pathOf(of)
          val prefix = s"dag-${d.name}-v"
          val cur = ManifestTable.currentVersion(spark, upPath)
            .getOrElse(0L)
          val water = tagWater(spark, d.path, prefix)
          val vs = ManifestTable.versions(spark, upPath)
            .filter(v => v > water && v <= cur)
          val filesRead =
            vs.map(ManifestTable.versionAddedFileCount(spark, upPath, _))
              .sum.toLong
          val (merged, _, unchanged) =
            graft.streaming.TableFeedSource.feedFold(spark, upPath,
              d.path, s"dag-${d.name}", stateOf, negate, mergeF, live,
              keys)
          val outcome =
            if (merged > 0L) "merged"
            else if (unchanged > 0L) "unchanged"
            else "no_new_data"
          Refreshed(d.name, "aggregate", outcome, cur, vs.size.toLong,
            if (outcome == "no_new_data") 0L else filesRead, 0L,
            ManifestTable.currentVersion(spark, d.path).getOrElse(-1L),
            null)

        case Materialize(inputs, compute) =>
          val tag = s"dag-${d.name}-run$runId"
          ManifestTable.committedVersionOfTag(spark, d.path, tag) match {
            case Some(v) =>
              Refreshed(d.name, "materialize", "skipped", -1L, 0L, 0L,
                0L, v, null)
            case None =>
              val frames = inputs.map(i =>
                i -> ManifestTable.read(spark, pathOf(i))).toMap
              val (gated, obs, names) =
                gateFlow(compute(frames), d, s"$tag-obs")
              val v = ManifestTable.write(gated, d.path,
                statsCols = d.statsCols, tag = Some(tag))
              val (rows, mj) = metricsJson(obs, names)
              Refreshed(d.name, "materialize", "landed", -1L, 0L, 0L,
                rows, v, mj)
          }
      }
  }

  /** One table's FULL refresh: rebuild from the upstream's CURRENT
    * content under the CURRENT rules, committed as ONE atomic
    * overwrite carrying the flow's watermark tag at the upstream's
    * current version (so incremental refresh resumes past the
    * rebuild). The audit row reports the rebuild's honest cost:
    * `versions_processed` = every surviving upstream version,
    * `files_read` = the upstream's full live file count. */
  private def refreshOneFull(spark: SparkSession, runId: Long,
                             d: TableDef): Refreshed = {
    def upstreamFull(of: String): Option[(String, Long, Long, Long)] = {
      val upPath = pathOf(of)
      ManifestTable.currentVersion(spark, upPath).map { cur =>
        val st = ManifestTable.resolveState(spark, upPath, cur)
        (upPath, cur,
          ManifestTable.versions(spark, upPath).count(_ <= cur).toLong,
          st.files.size.toLong)
      }
    }
    d.flow match {
      case Transform(of, rowFlow) => upstreamFull(of) match {
        case None =>
          Refreshed(d.name, "transform", "no_new_data", 0L, 0L, 0L, 0L,
            ManifestTable.currentVersion(spark, d.path).getOrElse(-1L),
            null)
        case Some((upPath, cur, nVs, files)) =>
          val (gated, obs, names) = gateFlow(
            rowFlow(ManifestTable.read(spark, upPath)), d,
            s"dag-${d.name}-full$runId-obs")
          val v = ManifestTable.write(gated, d.path,
            statsCols = d.statsCols, tag = Some(s"dag-${d.name}-v$cur"))
          val (rows, mj) = metricsJson(obs, names)
          Refreshed(d.name, "transform", "recomputed", cur, nVs, files,
            rows, v, mj)
      }

      case Aggregate(of, stateOf, _, _, live, keys) =>
        upstreamFull(of) match {
          case None =>
            Refreshed(d.name, "aggregate", "no_new_data", 0L, 0L, 0L,
              0L, ManifestTable.currentVersion(spark, d.path)
                .getOrElse(-1L), null)
          case Some((upPath, cur, nVs, files)) =>
            graft.streaming.TableFeedSource.feedFoldFull(spark, upPath,
              d.path, s"dag-${d.name}", stateOf, live, keys): Unit
            Refreshed(d.name, "aggregate", "recomputed", cur, nVs,
              files, 0L,
              ManifestTable.currentVersion(spark, d.path)
                .getOrElse(-1L), null)
        }

      case Cdc(of, key, seqBy, delWhen, tracked) =>
        upstreamFull(of) match {
          case None =>
            Refreshed(d.name, "cdc", "no_new_data", 0L, 0L, 0L, 0L,
              ManifestTable.currentVersion(spark, d.path)
                .getOrElse(-1L), null)
          case Some((upPath, cur, nVs, files)) =>
            // the feed is append-only (the incremental path enforces
            // it per commit), so its CURRENT content IS the whole
            // event history — one snapshot scan replaces the
            // version walk
            val (gated, obs, names) = gateFlow(
              ManifestTable.read(spark, upPath), d,
              s"dag-${d.name}-full$runId-obs")
            val tag = Some(s"dag-${d.name}-v$cur")
            val v = tracked match {
              case None => ApplyChanges.rebuildScd1(spark, d.path, key,
                gated, seqBy, delWhen, tag, d.statsCols)
              case Some(_) => ApplyChanges.rebuildScd2(spark, d.path,
                key, gated, seqBy, ts = cur, deleteWhen = delWhen,
                tag = tag, statsCols = d.statsCols)
            }
            val (rows, mj) = metricsJson(obs, names)
            Refreshed(d.name, "cdc", "recomputed", cur, nVs, files,
              rows, v, mj)
        }

      case SnapshotCdc(of, key, tracked) => upstreamFull(of) match {
        case None =>
          Refreshed(d.name, "snapshot_cdc", "no_new_data", 0L, 0L, 0L,
            0L, ManifestTable.currentVersion(spark, d.path)
              .getOrElse(-1L), null)
        case Some((upPath, cur, nVs, files)) =>
          // the upstream's current content IS the whole population a
          // snapshot asserts — the rebuild is the snapshot itself,
          // committed at snapshot sequence = the upstream version
          // (SCD2 history collapses to the rebuilt open slice, the
          // documented full-refresh contract for CDC edges)
          val (gated, obs, names) = gateFlow(
            ManifestTable.read(spark, upPath), d,
            s"dag-${d.name}-full$runId-obs")
          val seqed = gated.withColumn("_snap_seq", lit(cur))
          val tag = Some(s"dag-${d.name}-v$cur")
          val v = tracked match {
            case None => ApplyChanges.rebuildScd1(spark, d.path, key,
              seqed, "_snap_seq", None, tag, d.statsCols)
            case Some(_) => ApplyChanges.rebuildScd2(spark, d.path,
              key, seqed, "_snap_seq", ts = cur, deleteWhen = None,
              tag = tag, statsCols = d.statsCols)
          }
          val (rows, mj) = metricsJson(obs, names)
          Refreshed(d.name, "snapshot_cdc", "recomputed", cur, nVs,
            files, rows, v, mj)
      }

      case Materialize(inputs, compute) =>
        // same recompute as the incremental path, minus the run-tag
        // skip: full refresh is imperative — recompute IS the request
        val frames = inputs.map(i =>
          i -> ManifestTable.read(spark, pathOf(i))).toMap
        val (gated, obs, names) = gateFlow(compute(frames), d,
          s"dag-${d.name}-full$runId-obs")
        val v = ManifestTable.write(gated, d.path,
          statsCols = d.statsCols, tag = Some(s"dag-${d.name}-run$runId"))
        val (rows, mj) = metricsJson(obs, names)
        Refreshed(d.name, "materialize", "recomputed", -1L, 0L, 0L,
          rows, v, mj)

      case other => throw new IllegalStateException(
        s"full refresh reached a source edge '${d.name}' " +
          s"(${other.kind}) — refreshFull validates this earlier")
    }
  }

  /** DESCRIBE PIPELINE: the declared graph as a table — one row per
    * table in refresh order (name, flow kind, storage path, inputs,
    * expectations with their actions). */
  def describe(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ordered.map(d => (d.name, d.flow.kind, d.path,
        d.flow.inputs.mkString(","),
        d.expectations.map(e => s"${e.name}:${e.action.name}")
          .mkString(",")))
      .toDF("table", "flow", "path", "inputs", "expectations")
  }

  /** DESCRIBE PIPELINE EXTENDED: [[describe]]'s graph rows joined
    * with each table's LAST event-log record (highest run id; ties —
    * a failed attempt retried, a full refresh reusing a run id —
    * resolve to the highest committed version). Tables the log has no
    * row for (never refreshed, or vacuumed past retention) report
    * NULLs. Driver-side collect of the event log — bounded metadata
    * (runs × tables), the same class as DESCRIBE HISTORY. */
  def describeExtended(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val last: Map[String, (Long, String, Long, String)] =
      eventLog.filter(ManifestTable.currentVersion(spark, _).isDefined)
        .map { ep =>
          ManifestTable.read(spark, ep)
            .select(col("table"), col("run_id"), col("outcome"),
              col("committed_version"), col("expect_metrics"))
            .collect()
            .groupBy(_.getString(0))
            .map { case (t, rows) =>
              val r = rows.maxBy(r => (r.getLong(1), r.getLong(3)))
              t -> (r.getLong(1), r.getString(2), r.getLong(3),
                r.getString(4))
            }
        }.getOrElse(Map.empty)
    ordered.map { d =>
      val e = last.get(d.name)
      (d.name, d.flow.kind, d.path, d.flow.inputs.mkString(","),
        d.expectations.map(x => s"${x.name}:${x.action.name}")
          .mkString(","),
        e.map(_._1).map(java.lang.Long.valueOf).orNull,
        e.map(_._2).orNull,
        e.map(_._3).map(java.lang.Long.valueOf).orNull,
        e.map(_._4).orNull)
    }.toDF("table", "flow", "path", "inputs", "expectations",
      "last_run", "last_outcome", "last_version", "last_metrics")
  }

  /** Create the declared event-log table EMPTY when absent, so verbs
    * can persist pipeline metadata on it before any refresh has
    * logged. Returns the path (None when no event log is declared). */
  def ensureEventLog(spark: SparkSession): Option[String] =
    eventLog.map { ep =>
      if (ManifestTable.currentVersion(spark, ep).isEmpty) {
        import spark.implicits._
        val empty = Seq.empty[(Long, String, String, String, Long,
            Long, Long, Long, Long, String)]
          .toDF("run_id", "table", "flow", "outcome",
            "upstream_version", "versions_processed", "files_read",
            "rows_observed", "committed_version", "expect_metrics")
        ManifestTable.write(empty, ep): Unit
      }
      ep
    }

  /** Highest run id the event log records — 0 when no event log is
    * declared, the table is absent, or it is empty. The floor a
    * re-registered pipeline's auto run counter resumes from: a fresh
    * JVM re-running the same CREATE DDL must not restart at run 1,
    * whose tags would silently no-op every flow. */
  def maxLoggedRun(spark: SparkSession): Long =
    eventLog.filter(ManifestTable.currentVersion(spark, _).isDefined)
      .map { ep =>
        val r = ManifestTable.read(spark, ep)
          .agg(max(col("run_id"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }.getOrElse(0L)

  /** The pipeline event log as a table (DLT's event log surface). */
  def events(spark: SparkSession): DataFrame = {
    val ep = eventLog.getOrElse(throw new IllegalStateException(
      "this pipeline declared no event log path"))
    ManifestTable.read(spark, ep)
  }
}

/** Named-pipeline registry backing the SQL surface (`CREATE PIPELINE`
  * / `REFRESH PIPELINE` / `DESCRIBE PIPELINE` / `DROP PIPELINE`).
  * JVM-scoped (DLT's model too: the pipeline DEFINITION lives in
  * source, only the tables and the event log are durable) — the
  * per-name auto run counter restarts with the JVM, so a re-created
  * pipeline refreshed with an ALREADY-USED explicit run id no-ops its
  * run-tagged flows (that is the idempotency contract working, not a
  * bug; pass a fresh RUN id, or rely on ledger/watermark-driven flows
  * which need no run id at all). */
object Pipelines {
  private val reg = new java.util.concurrent.ConcurrentHashMap[
    String, (Dag, java.util.concurrent.atomic.AtomicLong)]()
  private val running = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[org.apache.spark.sql.streaming.StreamingQuery]]()

  /** START PIPELINE: run `name` continuously ([[Dag.continuous]]),
    * tracking the started queries so STOP can find them. Refuses when
    * already started (stop first — two subscriptions per edge would
    * race their checkpoints). */
  def start(name: String, spark: SparkSession,
            checkpointRoot: String): Seq[String] = {
    val dag = get(name)
    running.compute(name, (_, prev) => {
      require(prev == null || prev.forall(!_.isActive),
        s"pipeline '$name' is already running — STOP PIPELINE first")
      dag.continuous(spark, checkpointRoot)
    }).map(_.name)
  }

  /** STOP PIPELINE: stop `name`'s running continuous queries (no-op
    * list when none). Returns the stopped query names. */
  def stop(name: String): Seq[String] =
    Option(running.remove(name)).getOrElse(Nil).map { q =>
      if (q.isActive) q.stop()
      q.name
    }

  /** The live continuous queries of `name` (empty when not started). */
  def runningQueries(name: String)
      : Seq[org.apache.spark.sql.streaming.StreamingQuery] =
    Option(running.get(name)).getOrElse(Nil).filter(_.isActive)

  /** Register (or replace) `name`. `runFloor` seeds the auto run
    * counter — pass the event log's [[Dag.maxLoggedRun]] when
    * re-registering a pipeline whose runs already landed (a counter
    * restarting at 1 would re-issue run ids whose idempotency tags
    * silently no-op every flow). */
  def register(name: String, dag: Dag, runFloor: Long = 0L): Unit = {
    reg.put(name,
      (dag, new java.util.concurrent.atomic.AtomicLong(runFloor))): Unit
  }

  def get(name: String): Dag = Option(reg.get(name)).map(_._1)
    .getOrElse(throw new IllegalArgumentException(
      s"no pipeline '$name' registered (live: " +
        s"${names.mkString(", ")})"))

  /** Next auto run id for `name` (used when REFRESH names no RUN). */
  def nextRun(name: String): Long =
    Option(reg.get(name)).map(_._2.incrementAndGet())
      .getOrElse(throw new IllegalArgumentException(
        s"no pipeline '$name' registered"))

  /** Unregister (stopping any running continuous queries first). */
  def drop(name: String): Boolean = {
    stop(name): Unit
    reg.remove(name) != null
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    reg.keys.asScala.toSeq.sorted
  }
}
