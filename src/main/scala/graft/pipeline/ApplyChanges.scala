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

  /** Create an SCD1 target from an initial snapshot: every row's
    * applied sequence starts at `seq0`. */
  def initializeScd1(snapshot: DataFrame, path: String, seq0: Long,
                     statsCols: Seq[String] = Nil): Long =
    ManifestTable.write(snapshot.withColumn(SeqCol, lit(seq0)),
      path, statsCols = statsCols)

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
    * Returns the committed version. */
  def applyScd1(spark: SparkSession, path: String, key: String,
                cdc: DataFrame, sequenceBy: String,
                deleteWhen: Option[String] = None,
                tag: Option[String] = None): Long = {
    val dim = ManifestTable.read(spark, path)
    val bizCols = dim.schema.fieldNames.filterNot(_ == SeqCol)
    require(bizCols.forall(cdc.columns.contains),
      s"APPLY CHANGES batch must carry the business columns " +
        bizCols.mkString(","))
    val latest = latestPerKey(cdc, key, sequenceBy, deleteWhen)
    val isDel: Column = deleteWhen
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    // NO-CLAIM PRUNE (the SCD2 staging lesson, r16 verdict #1, applied
    // to SCD1): events that cannot fire any clause — late/equal-
    // sequence events for keys the target already applied past, and
    // deletes of absent keys — are dropped BEFORE the merge, so its
    // stats prune + confirm scan pay only for keys that actually
    // change. One column-pruned (key, _seq) scan of the target per
    // batch buys that; for the common mostly-late CDC replay the
    // merge source shrinks to nearly nothing.
    val cur = ManifestTable.read(spark, path)
      .select(col(key).as("_ac_k"), col(SeqCol).as("_ac_seq"))
    val relevant = latest
      .join(cur, col(key) === col("_ac_k"), "left")
      .filter(
        (col("_ac_k").isNull && !isDel) ||
          (col("_ac_k").isNotNull &&
            col(sequenceBy).cast("long") > col("_ac_seq")))
      .select(latest.columns.map(col): _*)
    // the staged source carries exactly the target schema's columns
    // (business + the sequence landing in `_seq`) plus the delete
    // flag for clause conditions. The key rides a NULL guard: a
    // null-keyed event can never match (SQL join semantics), so every
    // replay would RE-INSERT it — silent, unbounded duplication; the
    // guard fails the batch loudly at execution with zero extra jobs.
    val staged = relevant.select(
      Seq(when(col(key).isNotNull, col(key)).otherwise(raise_error(lit(
        s"APPLY CHANGES batch carries a NULL '$key' — a null key " +
          "can never match and would re-insert on every replay")))
        .as(key)) ++
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
      tag = tag)
  }

  /** APPLY CHANGES ... STORED AS SCD TYPE 2: history-keeping variant —
    * the in-batch latest-event reduction (same ordering contract as
    * SCD1, a delete outranking a same-sequence upsert), then
    * [[Scd2.applyChanges]] does the one-MERGE validity-range
    * maintenance at logical time `ts`. A delete event CLOSES the
    * key's open row at `ts` without a replacement (history retained —
    * DLT's SCD2 delete reading); a delete for an absent key no-ops. */
  def applyScd2(spark: SparkSession, path: String, key: String,
                cdc: DataFrame, tracked: Seq[String], sequenceBy: String,
                ts: Long, tag: Option[String] = None,
                deleteWhen: Option[String] = None): Long = {
    val latest = latestPerKey(cdc, key, sequenceBy, deleteWhen)
      .drop(sequenceBy)
    Scd2.applyChanges(spark, path, key, latest, tracked, ts, tag,
      deleteWhen)
  }
}
