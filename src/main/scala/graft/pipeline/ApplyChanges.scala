package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative CDC apply — the platform sugar over the engine's MERGE
  * and [[Scd2]] machinery (DLT's `APPLY CHANGES INTO tgt FROM src
  * KEYS (k) SEQUENCE BY seq [APPLY AS DELETE WHEN d] STORED AS SCD
  * TYPE 1|2`, reference ecosystem: delta-spark + DLT docs): the user
  * names the key, the ordering column, and the delete signal; the
  * verb handles OUT-OF-ORDER and DUPLICATE change events — the two
  * properties raw MERGE lacks and every real CDC feed has.
  *
  * Ordering contract (DLT's): per key, only the change with the
  * HIGHEST `sequenceBy` value applies, both WITHIN a batch (an
  * in-batch window reduction keeps the latest event per key — a
  * stale-then-fresh pair applies only the fresh one) and ACROSS
  * batches (the target persists each key's applied sequence in
  * `_seq`; a late-arriving batch whose event is older than the
  * stored sequence claims no clause and costs only its own staging).
  *
  * Scale shape: the reduction is one window over the BATCH (CDC
  * batches are small relative to the table); the merge inherits the
  * engine's stats-pruned, confirm-scanned copy-on-write — O(touched
  * files), never O(table).
  */
object ApplyChanges {

  /** The per-key applied-sequence column SCD1 targets persist. */
  val SeqCol = "_seq"

  /** In-batch latest-event-per-key reduction: row_number over
    * (key ORDER BY seq DESC), ties broken by the delete flag (a
    * delete outranks an upsert at the same sequence — DLT's reading)
    * then arbitrarily-but-deterministically by the remaining columns'
    * hash, so re-runs reduce identically. */
  private def latestPerKey(cdc: DataFrame, key: String, seqCol: String,
                           deleteCol: Option[String]): DataFrame = {
    val delRank = deleteCol
      .map(d => coalesce(col(d), lit(false)).cast("int").desc)
      .getOrElse(lit(0).desc)
    val others = cdc.columns.filterNot(c => c == key || c == seqCol)
      .map(col).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(col(seqCol).desc +: delRank +: (
        if (others.isEmpty) Seq.empty
        else Seq(xxhash64(others: _*).asc)): _*)
    cdc.withColumn("_ac_rn", row_number().over(w))
      .filter(col("_ac_rn") === 1).drop("_ac_rn")
  }

  /** The sequence column with a loud NULL guard (original type kept —
    * callers cast where they persist it). */
  private def guardedSeq(cdc: DataFrame, seqCol: String): Column =
    when(col(seqCol).isNotNull, col(seqCol))
      .otherwise(raise_error(lit(
        s"APPLY CHANGES batch carries a NULL '$seqCol' — a NULL " +
          "sequence neither orders nor gates and would poison the " +
          "key's high-water")).cast(cdc.schema(seqCol).dataType))

  /** Create an SCD1 target from an initial snapshot: every row's
    * applied sequence starts at `seq0`. */
  def initializeScd1(snapshot: DataFrame, path: String, seq0: Long,
                     statsCols: Seq[String] = Nil): Long =
    ManifestTable.write(snapshot.withColumn(SeqCol, lit(seq0)),
      path, statsCols = statsCols)

  /** Create an SCD2 target from an initial snapshot: every row opens
    * at `ts` with applied sequence `seq0` persisted — the cross-batch
    * ordering guard of [[applyScd2]] gates on it from the first
    * batch. (A target created by [[Scd2.initialize]] without the
    * sequence column still upgrades: the first seq-aware apply
    * evolves `_seq` in its own commit.) */
  def initializeScd2(snapshot: DataFrame, path: String, ts: Long,
                     seq0: Long, statsCols: Seq[String] = Nil): Long =
    Scd2.initialize(snapshot, path, ts, statsCols, seq0 = Some(seq0))

  /** APPLY CHANGES ... STORED AS SCD TYPE 1: the target keeps each
    * key's LATEST state. `cdc` carries the business columns plus
    * `sequenceBy` (the ordering column) and, optionally, a boolean
    * `deleteWhen` column marking delete events. One atomic MERGE:
    *
    *  - matched + delete-flagged + newer  → DELETE;
    *  - matched + newer                   → UPDATE to the new image
    *    (and advance `_seq`);
    *  - matched + not newer               → claim nothing (the late
    *    arrival is withheld, the base row carries verbatim);
    *  - not matched + not delete-flagged  → INSERT (a delete for an
    *    absent key is a no-op, DLT's semantics).
    *
    * `truncateWhen` (DLT's `APPLY AS TRUNCATE WHEN`, SCD TYPE 1 only)
    * names a boolean event column marking FULL-TABLE truncates: when
    * any event in the batch fires it, the whole target truncates at
    * the highest truncate sequence, then only the batch's events
    * STRICTLY NEWER than that sequence apply on the emptied table
    * (truncate events themselves are consumed, never applied as
    * rows). Re-running the batch reproduces the same state —
    * truncate-then-reapply is idempotent by value. A firing truncate
    * commits as ONE atomic selective overwrite (truncate + surviving
    * events together): no reader ever observes an empty intermediate
    * version and no crash window separates the wipe from the reapply.
    *
    * GENERATED columns of the target are never business columns: the
    * batch must not carry them (the engine recomputes them from their
    * declarations inside the commit, MERGE refuses assigning them) —
    * APPLY CHANGES into a shredded-variant or otherwise generated
    * table composes transparently.
    *
    * `target`, when supplied, is the ALREADY-READ target frame (the
    * snapshot verb threads its diff read here, so ONE manifest
    * resolve serves diff + schema + prune — a concurrent commit
    * cannot split them).
    *
    * Returns the committed version. */
  def applyScd1(spark: SparkSession, path: String, key: String,
                cdc: DataFrame, sequenceBy: String,
                deleteWhen: Option[String] = None,
                tag: Option[String] = None,
                truncateWhen: Option[String] = None,
                schemaEvolution: Boolean = false,
                target: Option[DataFrame] = None): Long = {
    // REPLAY fast path: an already-committed tag exits before ANY
    // work — critically BEFORE a truncate (a replayed truncate batch
    // must not re-wipe a table whose merge will then tag-no-op) and
    // before the prune scan
    tag.flatMap(ManifestTable.committedVersionOfTag(spark, path, _))
      .foreach(v => return v)
    // the threaded target read serves the SCHEMA/generated-columns
    // check only (the r16-era no-claim pre-join is gone — the prune
    // now happens inside mergeMultiKeyed's clause compile); snapshot
    // callers still thread their diff read here so diff and schema
    // check share one manifest resolve
    val dim = target.getOrElse(ManifestTable.read(spark, path))
    // generated columns recompute inside the commit from their
    // declarations — they are not business columns and a batch
    // carrying one would trip MERGE's no-assigning-generated rule
    val genCols = ManifestTable.generatedColumns(spark, path).keySet
    val bizCols0 = dim.schema.fieldNames
      .filterNot(c => c == SeqCol || genCols.contains(c))
    require(bizCols0.forall(cdc.columns.contains),
      s"APPLY CHANGES batch must carry the business columns " +
        bizCols0.mkString(","))
    // SCHEMA EVOLUTION (DLT's automatic CDC evolution, opt-in here
    // like MERGE's WITH SCHEMA EVOLUTION): business columns the feed
    // gained evolve the target through the merge commit; existing
    // rows read them as NULL through schema-on-read. Control columns
    // (sequence/delete/truncate flags) never become business columns.
    val reserved = Set(sequenceBy) ++ deleteWhen ++ truncateWhen
    val bizCols =
      if (!schemaEvolution) bizCols0
      else bizCols0 ++ cdc.columns.filterNot(c =>
        bizCols0.contains(c) || reserved.contains(c) ||
          genCols.contains(c) || c.startsWith("_ac_"))
    val isDel: Column = deleteWhen
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    // a null-keyed event can never match (SQL join semantics), so
    // every replay would RE-INSERT it — silent, unbounded
    // duplication; the guard fails the batch loudly at execution
    val guardedKey: Column =
      when(col(key).isNotNull, col(key)).otherwise(raise_error(lit(
        s"APPLY CHANGES batch carries a NULL '$key' — a null key " +
          "can never match and would re-insert on every replay")))
    // the SEQUENCE rides its NULL guard UP FRONT — before the
    // truncate filter and before the per-key reduction: a NULL
    // sequence neither orders (the reduction window can't place it —
    // a desc sort parks it LAST, silently discarding the event
    // whenever the key has any non-NULL sibling) nor gates (every `>`
    // against it reads NULL, silently dropping the event) — EVERY
    // NULL sequence fails the batch loudly instead
    val guarded = cdc.withColumn(sequenceBy, guardedSeq(cdc, sequenceBy))
    // APPLY AS TRUNCATE WHEN: the truncate high-water is the largest
    // truncate-flagged sequence in the batch (one bounded agg). A
    // firing truncate compiles truncate + surviving-events-reapply
    // into ONE atomic selective-overwrite commit — the emptied table
    // is never a committed version, so concurrent readers can't
    // observe it and a crash leaves the previous state intact.
    val events = truncateWhen match {
      case None => guarded
      case Some(tw) =>
        val isTrunc = coalesce(col(tw), lit(false))
        val r = guarded.agg(max(when(isTrunc,
          col(sequenceBy).cast("long"))).as("m")).head()
        if (r.isNullAt(0)) guarded.filter(!isTrunc)
        else {
          val truncSeq = r.getLong(0)
          require(bizCols.size == bizCols0.size,
            "APPLY AS TRUNCATE WHEN fired in a schema-evolving batch" +
              " — evolve the target first (ALTER TABLE ADD COLUMNS)," +
              " then apply: the atomic truncate-overwrite commits" +
              " exactly the current table schema")
          // survivors: strictly-newer events, reduced to the latest
          // per key, minus deletes (a delete on the emptied table is
          // a no-op) — the exact state the old truncate-then-merge
          // produced, in one commit
          val survivors = guarded.filter(!isTrunc &&
            col(sequenceBy).cast("long") > truncSeq)
          val latestT = latestPerKey(survivors, key, sequenceBy,
            deleteWhen).filter(!isDel)
          val stagedT = latestT.select(
            Seq(guardedKey.as(key)) ++
              bizCols.filterNot(_ == key).map(col) ++
              Seq(col(sequenceBy).cast("long").as(SeqCol)): _*)
          return ManifestTable.overwriteWhere(stagedT, path, lit(true),
            tag = tag)
        }
    }
    val latest0 = latestPerKey(events, key, sequenceBy, deleteWhen)
    // No unconditional no-claim prune join here (optimization round
    // 19, removed): the clause conditions below carry the
    // strictly-newer gate (`_seq > _b__seq`) and the insert gate
    // (`!_ac_delete`), and mergeMultiKeyed's compile drops every row
    // that claims NO clause BEFORE the keyed copy-on-write runs —
    // late/equal-sequence events and deletes of absent keys never
    // reach the confirm scan or the REWRITE candidate bounds (those
    // are computed over the post-claim compiled frame). The r16-era
    // pre-join against a (key, _seq) target scan re-derived exactly
    // that set at the cost of one extra dim scan + shuffle join per
    // batch — pure overhead on fixture-scale dims.
    //
    // SCALE GATE (optimization round 20 — the r19 verdict's
    // adversarial late-replay question, measured in DevLateReplay):
    // the merge's RESOLUTION scan is pruned by the PRE-claim batch key
    // bounds, so a mostly-late replay over a wide table reads base
    // files the claim compile then discards (measured 7× the ideal
    // input on a 95%-late batch). On a dimension with many files the
    // one column-pruned (key, _seq) scan + high-water semi-prune is
    // far cheaper than a widened full-width read, so the pre-join
    // returns CONDITIONALLY: only past
    // `spark.graft.applyChanges.latePruneMinFiles` data files
    // (default 64 — fixture-scale dims of a handful of files never
    // pay it; a 100 TB dimension always does). Semantics are identical
    // either way under the verb's single-CDC-writer contract: events
    // at-or-below the key's high-water claim no clause and deletes of
    // absent keys no-op — the pre-join merely drops them before the
    // resolution scan instead of after it (r19 verdict proved the
    // equivalence; SCD2 already prunes pre-merge via its rollup's
    // high-water gate). Caveat, same exposure the r16 pre-join shape
    // carried: the gate evaluates against THIS read's snapshot, so if
    // a CONCURRENT non-CDC writer rewrites the key's history (raw
    // delete of the row and its `_seq`) between this read and a merge
    // OCC retry, a pre-dropped event stays dropped where the ungated
    // clause compile would re-classify it against the new state.
    // Late-vs-vanished-high-water is ambiguous CDC semantics either
    // way; the gate picks the pre-join's historical reading.
    val latePruneMinFiles = spark.conf
      .getOption("spark.graft.applyChanges.latePruneMinFiles")
      .flatMap(_.toIntOption).getOrElse(64)
    val dimFiles = ManifestTable.currentVersion(spark, path)
      .map(v => ManifestTable.fileCountOf(spark, path, v)).getOrElse(0)
    val latest =
      if (dimFiles < latePruneMinFiles) latest0
      else {
        val hw = dim.groupBy(col(key).as("_ac_hwk"))
          .agg(max(col(SeqCol)).as("_ac_hw"))
        latest0.join(hw, col(key) === col("_ac_hwk"), "left")
          .filter(col("_ac_hw").isNull ||
            col(sequenceBy).cast("long") > col("_ac_hw"))
          .drop("_ac_hwk", "_ac_hw")
      }
    // (A FIRING truncate returned above as one atomic overwrite, so
    // reaching here means the target is untouched.)
    //
    // the staged source carries exactly the target schema's
    // NON-GENERATED columns (business + the sequence landing in
    // `_seq`) plus the delete flag for clause conditions — generated
    // columns recompute in the merge's own staging pass. The key
    // rides its NULL guard (zero extra jobs).
    val staged = latest.select(
      Seq(guardedKey.as(key)) ++
        bizCols.filterNot(_ == key).map(col) ++
        Seq(col(sequenceBy).cast("long").as(SeqCol),
          isDel.as("_ac_delete")): _*)
    ManifestTable.mergeMultiKeyed(
      staged, path, Seq(key),
      matched = Seq(
        ManifestTable.MergeDelete(
          Some(col("_ac_delete") && col(SeqCol) > col(s"_b_$SeqCol"))),
        ManifestTable.MergeUpdate(
          Some(col(SeqCol) > col(s"_b_$SeqCol")),
          bizCols.filterNot(_ == key).map(c => c -> col(c)).toSeq :+
            (SeqCol -> col(SeqCol)))),
      notMatched = Seq(ManifestTable.MergeInsert(
        Some(!col("_ac_delete")),
        (key -> col(key)) +:
          bizCols.filterNot(_ == key).map(c => c -> col(c)).toSeq :+
          (SeqCol -> col(SeqCol)))),
      schemaEvolution = schemaEvolution && bizCols.size > bizCols0.size,
      tag = tag)
  }

  /** APPLY CHANGES ... STORED AS SCD TYPE 2: history-keeping variant —
    * the in-batch latest-event reduction (same ordering contract as
    * SCD1, a delete outranking a same-sequence upsert), then
    * [[Scd2.applyChanges]] does the one-MERGE validity-range
    * maintenance at logical time `ts`, PERSISTING each key's applied
    * sequence in the dimension's `_seq` column. A delete event CLOSES
    * the key's open row at `ts` without a replacement (history
    * retained — DLT's SCD2 delete reading) and records the delete's
    * sequence on the closed row; a delete for an absent key no-ops.
    *
    * CROSS-BATCH ordering (round 18 — the same strictly-newer
    * contract SCD1 enforces): before the merge, events at or below
    * the key's persisted sequence HIGH-WATER (max `_seq` over the
    * key's history — the open row's opening sequence, or the closing
    * delete's) are pruned, so a late or replayed batch can neither
    * close the current open row with a stale version nor resurrect a
    * deleted key. One column-pruned (key, `_seq`) scan per batch buys
    * the guard. Rows predating the sequence upgrade (a target created
    * by [[Scd2.initialize]] without `_seq` — the column evolves on
    * the first seq-aware apply) read NULL = no recorded high-water,
    * so their keys accept any sequence, exactly the pre-upgrade
    * behavior. Residual contract: the high-water advances only when
    * an event APPLIES (opens, closes or inserts a row) — an event
    * whose tracked attributes are unchanged claims nothing and does
    * not advance it, so callers replaying interleaved no-op snapshots
    * out of order should order batches coarsely by `ts` as before. */
  def applyScd2(spark: SparkSession, path: String, key: String,
                cdc: DataFrame, tracked: Seq[String], sequenceBy: String,
                ts: Long, tag: Option[String] = None,
                deleteWhen: Option[String] = None): Long = {
    // replay fast path: an already-committed tag skips the prune scan
    // too (the merge itself would no-op on the tag anyway)
    tag.flatMap(ManifestTable.committedVersionOfTag(spark, path, _))
      .foreach(v => return v)
    // NULL-sequence guard BEFORE the reduction (same reading as SCD1:
    // a desc sort parks NULL last and silently discards the event
    // whenever the key has a non-NULL sibling — every NULL fails)
    val guarded = cdc.withColumn(sequenceBy, guardedSeq(cdc, sequenceBy))
    val latest = latestPerKey(guarded, key, sequenceBy, deleteWhen)
    val dim = ManifestTable.read(spark, path)
    val dimHasSeq = dim.schema.fieldNames.contains(SeqCol)
    require(tracked.nonEmpty, "SCD2 needs at least one tracked column")
    // ONE pass over the dimension serves BOTH per-batch questions
    // (optimization round 19 — these used to be two scans + two
    // joins): the per-key sequence HIGH-WATER (max `_seq` over the
    // key's whole history — late-arrival gate) and the OPEN row's
    // tracked attributes (change detection). The rollup groups one
    // column-pruned (key, _seq, _valid_to, tracked…) scan by key;
    // `first(when(open, struct(tracked)), ignoreNulls)` is
    // deterministic because a key has at most ONE open row. One left
    // join of the (small) reduced batch against the rollup then
    // classifies every event: late (pruned), delete-with-open-row
    // (close), changed (close+reopen), new (insert) — unchanged keys
    // and deletes of absent keys drop here, exactly the old
    // two-join semantics.
    val trackedFields = tracked.distinct
    val openStruct = struct(trackedFields.map(col): _*)
    val hwAgg: Column =
      if (dimHasSeq) max(col(SeqCol)).as("_ac_hw")
      else max(lit(null).cast("long")).as("_ac_hw")
    val rollup = dim.groupBy(col(key).as("_ac_k"))
      .agg(hwAgg,
        first(when(col(Scd2.ValidTo).isNull, openStruct),
          ignoreNulls = true).as("_ac_open"),
        // invariant witness, same pass: a key with MORE than one open
        // row (corrupted dimension) would make the `first(...)` pick
        // arbitrary and change detection nondeterministic — fail loudly
        // on any such key the batch touches instead
        count(when(col(Scd2.ValidTo).isNull, lit(1))).as("_ac_nopen"))
    val isDel: Column = deleteWhen
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    val joined = latest.join(rollup, col(key) === col("_ac_k"), "left")
      // high-water gate: keys absent from the target (or with no
      // recorded sequence — pre-upgrade rows) accept any sequence
      .filter(col("_ac_hw").isNull ||
        col(sequenceBy).cast("long") > col("_ac_hw"))
    // NULL `_ac_nopen` (unmatched key) reads false — only corrupted
    // keys the batch actually references raise
    val openPresent = when(col("_ac_nopen") > 1, raise_error(lit(
        s"SCD2 dimension at $path is corrupt — a key has more than " +
          "one open row (_valid_to IS NULL); change detection would " +
          "be nondeterministic")).cast("boolean"))
      .otherwise(col("_ac_open").isNotNull)
    val changedCond = trackedFields
      .map(a => !(col(a) <=> col("_ac_open").getField(a)))
      .reduce(_ || _)
    val flagged = joined
      .withColumn("_scd_del", isDel && openPresent)
      .withColumn("_scd_chg", !isDel && openPresent && changedCond)
      .withColumn("_scd_new", !isDel && !openPresent)
      .filter(col("_scd_del") || col("_scd_chg") || col("_scd_new"))
      .select(latest.columns.map(col) ++
        Seq(col("_scd_chg"), col("_scd_del")): _*)
    Scd2.applyFlagged(spark, path, key, latest.columns.toSeq, flagged,
      tracked, ts, tag, seqCol = Some(sequenceBy))
  }

  /** The snapshot-vs-target CHANGE SET: full-outer join on the key,
    * classify — snapshot-only INSERTs, both-sides-with-any-difference
    * UPDATEs, target-only DELETEs (the snapshot is authoritative for
    * the whole key population, DLT's FROM SNAPSHOT reading). Keys
    * equal on every business column emit NOTHING, so the apply's
    * merge pays only for keys that actually moved. Returns events
    * shaped for [[applyScd1]]/[[applyScd2]] with `_snap_seq` /
    * `_snap_del` columns. */
  private def snapshotEvents(target: DataFrame, snapshot: DataFrame,
                             key: String, bizCols: Seq[String],
                             snapshotSeq: Long): DataFrame = {
    val t = target.select(bizCols.map(c => col(c).as(s"_t_$c")): _*)
    val s = snapshot.select(bizCols.map(col): _*)
      .withColumn("_s_present", lit(true))
    val joined = s.join(t, col(key) === col(s"_t_$key"), "full_outer")
    val sPresent = col("_s_present").isNotNull
    val tPresent = col(s"_t_$key").isNotNull
    val differs = bizCols.filterNot(_ == key)
      .map(c => !(col(c) <=> col(s"_t_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.filter(
      (sPresent && !tPresent) ||            // insert
        (sPresent && tPresent && differs) ||// update
        (!sPresent && tPresent))            // delete
      .select(
        bizCols.map(c =>
          when(sPresent, col(c)).otherwise(col(s"_t_$c")).as(c)) ++
          Seq(lit(snapshotSeq).as("_snap_seq"),
            (!sPresent).as("_snap_del")): _*)
  }

  /** APPLY CHANGES FROM SNAPSHOT, SCD TYPE 1 (DLT's snapshot-CDC
    * verb — `apply_changes_from_snapshot` / the auto-CDC snapshot
    * flow): the source is a periodic FULL snapshot, not an event
    * feed — the change set derives by diffing it against the
    * target's current state, then applies through the ordinary
    * [[applyScd1]] machinery at sequence `snapshotSeq` (callers pass
    * snapshot versions in increasing order — DLT's contract; a
    * REPLAYED snapshot derives an EMPTY change set against the
    * already-applied state, so re-runs are idempotent by
    * construction AND gated by the `_seq` high-water).
    *
    * Scale shape: the diff is one full-outer join of snapshot vs a
    * column-pruned target scan — O(snapshot ∪ target), inherent to
    * snapshot diffing — but only CHANGED keys reach the merge, so
    * the write side stays O(touched files). */
  def applyScd1FromSnapshot(spark: SparkSession, path: String,
                            key: String, snapshot: DataFrame,
                            snapshotSeq: Long,
                            tag: Option[String] = None): Long = {
    // ONE target read serves the diff AND (threaded through) the
    // apply's schema/generated-columns check — a concurrent commit
    // cannot split them onto different versions (the no-claim prune
    // itself lives in mergeMultiKeyed's clause compile since r19)
    val dim = ManifestTable.read(spark, path)
    val genCols = ManifestTable.generatedColumns(spark, path).keySet
    val bizCols = dim.schema.fieldNames
      .filterNot(c => c == SeqCol || genCols.contains(c)).toSeq
    require(bizCols.forall(snapshot.columns.contains),
      s"snapshot must carry the business columns ${bizCols.mkString(",")}")
    val events = snapshotEvents(dim, snapshot, key, bizCols, snapshotSeq)
    applyScd1(spark, path, key, events, sequenceBy = "_snap_seq",
      deleteWhen = Some("_snap_del"), tag = tag, target = Some(dim))
  }

  /** APPLY CHANGES FROM SNAPSHOT, SCD TYPE 2: the same derived
    * change set maintains validity-ranged history at logical time
    * `ts` — a key that left the snapshot closes its open row
    * (history retained), a changed key closes+reopens, a new key
    * opens; sequence high-water rides `snapshotSeq` as in the event
    * form. */
  def applyScd2FromSnapshot(spark: SparkSession, path: String,
                            key: String, snapshot: DataFrame,
                            tracked: Seq[String], snapshotSeq: Long,
                            ts: Long, tag: Option[String] = None): Long = {
    val dim = ManifestTable.read(spark, path)
    val genCols = ManifestTable.generatedColumns(spark, path).keySet
    val bizCols = dim.schema.fieldNames.filterNot(n =>
      n == SeqCol || n == Scd2.ValidFrom || n == Scd2.ValidTo ||
        genCols.contains(n)).toSeq
    require(bizCols.forall(snapshot.columns.contains),
      s"snapshot must carry the business columns ${bizCols.mkString(",")}")
    // diff against the OPEN slice only — closed history is not part
    // of the key population a snapshot asserts
    val open = dim.filter(col(Scd2.ValidTo).isNull)
    val events = snapshotEvents(open, snapshot, key, bizCols, snapshotSeq)
    applyScd2(spark, path, key, events, tracked,
      sequenceBy = "_snap_seq", ts = ts, tag = tag,
      deleteWhen = Some("_snap_del"))
  }

  /** FULL-REFRESH rebuild of an SCD1 dimension (DLT's full refresh
    * applied to an APPLY CHANGES flow): reprocess the ENTIRE event
    * feed as ONE batch — the engine's in-batch latest-per-key
    * reduction (delete outranking a same-sequence upsert) picks each
    * key's final state, delete-final keys vanish — and commit it as
    * ONE atomic overwrite carrying the caller's watermark tag.
    * Exactly what a fresh target would hold after one incremental
    * bootstrap over the same feed; because the table REWRITES, the
    * target's persisted expectations re-gate every rebuilt row — a
    * rule declared after history landed applies retroactively, the
    * thing incremental refresh can never do. The target may not exist
    * yet (a full refresh of a fresh graph): business columns then
    * derive from the feed minus the control columns. */
  def rebuildScd1(spark: SparkSession, path: String, key: String,
                  cdc: DataFrame, sequenceBy: String,
                  deleteWhen: Option[String] = None,
                  tag: Option[String] = None,
                  statsCols: Seq[String] = Nil): Long = {
    val staged = rebuildStaged(spark, path, key, cdc, sequenceBy,
      deleteWhen, extraControl = Nil)
    ManifestTable.write(staged, path, statsCols = statsCols, tag = tag)
  }

  /** FULL-REFRESH rebuild of an SCD2 dimension: same one-batch
    * reprocess as [[rebuildScd1]], committed as ONE atomic overwrite.
    * History COLLAPSES by construction — validity ranges derive from
    * refresh boundaries, and a rebuild has exactly one: every
    * surviving key opens at `ts` with its final image and sequence
    * (identical to what a fresh target would hold after one
    * incremental bootstrap — the engine's documented in-batch
    * reduction keeps each key's latest event). Callers who need the
    * accumulated history intact should not full-refresh an SCD2 edge;
    * the verb is for rebuilding the CURRENT dimension under changed
    * rules. */
  def rebuildScd2(spark: SparkSession, path: String, key: String,
                  cdc: DataFrame, sequenceBy: String, ts: Long,
                  deleteWhen: Option[String] = None,
                  tag: Option[String] = None,
                  statsCols: Seq[String] = Nil): Long = {
    val staged = rebuildStaged(spark, path, key, cdc, sequenceBy,
      deleteWhen,
      extraControl = Seq(Scd2.ValidFrom, Scd2.ValidTo))
      .withColumn(Scd2.ValidFrom, lit(ts))
      .withColumn(Scd2.ValidTo, lit(null).cast("long"))
    ManifestTable.write(staged, path, statsCols = statsCols, tag = tag)
  }

  /** The shared rebuild staging: NULL guards up front, latest-per-key
    * over the whole feed, delete-final keys dropped, business columns
    * + `_seq` (generated columns recompute in the write's own staging
    * pass). */
  private def rebuildStaged(spark: SparkSession, path: String,
                            key: String, cdc: DataFrame,
                            sequenceBy: String,
                            deleteWhen: Option[String],
                            extraControl: Seq[String]): DataFrame = {
    val bizCols: Seq[String] =
      ManifestTable.currentVersion(spark, path) match {
        case Some(_) =>
          val genCols = ManifestTable.generatedColumns(spark, path).keySet
          ManifestTable.read(spark, path).schema.fieldNames
            .filterNot(c => c == SeqCol || genCols.contains(c) ||
              extraControl.contains(c)).toSeq
        case None =>
          cdc.columns.filterNot(c =>
            c == sequenceBy || deleteWhen.contains(c)).toSeq
      }
    require(bizCols.forall(cdc.columns.contains),
      s"rebuild feed must carry the business columns " +
        bizCols.mkString(","))
    val guarded = cdc.withColumn(sequenceBy, guardedSeq(cdc, sequenceBy))
    val latest = latestPerKey(guarded, key, sequenceBy, deleteWhen)
    val isDel: Column = deleteWhen
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    val guardedKey: Column =
      when(col(key).isNotNull, col(key)).otherwise(raise_error(lit(
        s"rebuild feed carries a NULL '$key' — a null key has no " +
          "dimension identity")))
    latest.filter(!isDel).select(
      Seq(guardedKey.as(key)) ++
        bizCols.filterNot(_ == key).map(col) ++
        Seq(col(sequenceBy).cast("long").as(SeqCol)): _*)
  }

  /** STREAMING APPLY CHANGES — DLT's native habitat for the verb: a
    * CDC *stream* (any streaming DataFrame — a
    * [[graft.streaming.TableFeedSource]] subscription, a file/socket
    * source, a rate-shaped feed) applies to the SCD1 target one
    * micro-batch at a time through [[applyScd1]]. EXACTLY-ONCE by
    * construction: each batch commits under the idempotency tag
    * `<queryTag>-b<batchId>`, so a restart that replays a batch (the
    * foreachBatch at-least-once contract) exits before any work —
    * including before a truncate — and the ordering contract degrades
    * gracefully across replays because the per-key `_seq` high-water
    * makes every strictly-older event a no-op anyway (belt and
    * braces: tags make replays free, sequences make them harmless).
    *
    * Scale shape: per micro-batch the cost is [[applyScd1]]'s — one
    * column-pruned (key, `_seq`) scan plus an O(touched-files) merge;
    * the stream never rereads the dimension's history.
    */
  def streamScd1(cdcStream: DataFrame, path: String, key: String,
                 sequenceBy: String,
                 deleteWhen: Option[String] = None,
                 truncateWhen: Option[String] = None,
                 queryTag: String = "apply-changes",
                 checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = cdcStream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyScd1(batch.sparkSession, path, key, batch, sequenceBy,
          deleteWhen, tag = Some(s"$queryTag-b$batchId"),
          truncateWhen = truncateWhen): Unit
      }
    checkpoint.map(w.option("checkpointLocation", _)).getOrElse(w).start()
  }

  /** Streaming APPLY CHANGES, SCD TYPE 2: like [[streamScd1]] but
    * each micro-batch maintains validity-ranged history through
    * [[applyScd2]] at logical time `tsOf(batchId)` (default: the
    * batch id itself — callers with a real event-time notion pass
    * their own). Same exactly-once tagging; the persisted per-key
    * sequence high-water keeps replayed/late batches from opening
    * stale versions or resurrecting deletes. */
  def streamScd2(cdcStream: DataFrame, path: String, key: String,
                 tracked: Seq[String], sequenceBy: String,
                 deleteWhen: Option[String] = None,
                 tsOf: Long => Long = identity,
                 queryTag: String = "apply-changes-scd2",
                 checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = cdcStream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyScd2(batch.sparkSession, path, key, batch, tracked,
          sequenceBy, ts = tsOf(batchId),
          tag = Some(s"$queryTag-b$batchId"),
          deleteWhen = deleteWhen): Unit
      }
    checkpoint.map(w.option("checkpointLocation", _)).getOrElse(w).start()
  }
}
