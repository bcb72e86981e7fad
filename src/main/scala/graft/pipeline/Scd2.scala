package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING DIMENSION Type 2 maintenance — the canonical
  * lakehouse CDC→dimension pattern (delta's documented SCD2 MERGE
  * recipe, DLT's APPLY CHANGES ... STORED AS SCD TYPE 2): each
  * business key keeps its full attribute HISTORY as validity-ranged
  * rows (`_valid_from`, `_valid_to`; `_valid_to IS NULL` = the open
  * row), and one batch of upserts closes the superseded open rows and
  * inserts their replacements in ONE atomic MERGE commit.
  *
  * The single-MERGE shape (no read-modify-overwrite of the
  * dimension): the staged source is the batch UNION a second copy of
  * exactly the CHANGED rows with a NULL merge key —
  *
  *  - the keyed copy holds the real business key: it matches the
  *    key's OPEN row (the residual `t._valid_to IS NULL` withholds
  *    closed history) and the conditional UPDATE closes it only when
  *    a tracked attribute actually changed; an unchanged batch row
  *    claims nothing and costs nothing;
  *  - the NULL-keyed copy can never match (SQL join semantics) and
  *    reaches the insert clause, writing the replacement open row
  *    (the real key rides a side column into the insert image);
  *  - a brand-new business key has only the keyed copy, matches
  *    nothing, and inserts its first open row;
  *  - closed history rows of a changed key are key-matched but
  *    residual-withheld — the keyed carry re-emits them VERBATIM.
  *
  * Scale shape: the change detection is one join of the batch against
  * the OPEN slice only (`_valid_to IS NULL` filter pushes to the
  * scan), the merge's copy-on-write touches only files holding
  * matched keys, and everything else is the merge machinery's
  * existing cost model. History grows per CHANGE, never per batch.
  */
object Scd2 {

  val ValidFrom = "_valid_from"
  val ValidTo = "_valid_to"

  /** Create the dimension from an initial snapshot: every row opens
    * at `ts` (`_valid_from = ts`, `_valid_to = NULL`). `seq0`
    * optionally persists an initial applied SEQUENCE per row (the
    * [[ApplyChanges.applyScd2]] cross-batch ordering guard reads it;
    * a seq-aware apply onto a dimension created WITHOUT it evolves
    * the column in its first commit). */
  def initialize(snapshot: DataFrame, path: String, ts: Long,
                 statsCols: Seq[String] = Nil,
                 seq0: Option[Long] = None): Long = {
    val base = snapshot.withColumn(ValidFrom, lit(ts))
      .withColumn(ValidTo, lit(null).cast("long"))
    ManifestTable.write(
      seq0.map(s0 => base.withColumn(ApplyChanges.SeqCol, lit(s0)))
        .getOrElse(base),
      path, statsCols = statsCols)
  }

  /** Apply one batch of upserts at logical time `ts`. `tracked` are
    * the attribute columns whose change opens a new version; other
    * columns ride along on the new row but never trigger one. The
    * batch must be key-unique (the merge's own contract).
    * `deleteWhen` optionally names a boolean batch column marking
    * DELETE events: a delete CLOSES the key's open row at `ts`
    * without a replacement (history retained, no open row remains —
    * DLT's SCD2 delete reading); a delete for a key with no open row
    * is a no-op. `seqCol` optionally names the batch column carrying
    * each event's SEQUENCE: the dimension then PERSISTS the applied
    * sequence in `_seq` — a replacement open row records its event's
    * sequence, a delete-close records the delete's sequence on the
    * closed row — so [[ApplyChanges.applyScd2]]'s cross-batch
    * late-arrival guard has a high-water to gate on (a target lacking
    * `_seq` evolves it in this commit; pre-existing rows read NULL =
    * "no recorded sequence", which the guard treats as
    * always-applicable). Returns the committed version. */
  def applyChanges(spark: SparkSession, path: String, key: String,
                   batch: DataFrame, tracked: Seq[String],
                   ts: Long, tag: Option[String] = None,
                   deleteWhen: Option[String] = None,
                   seqCol: Option[String] = None): Long = {
    require(tracked.nonEmpty, "SCD2 needs at least one tracked column")
    val isDel: Column = deleteWhen
      .map(d => coalesce(col(d), lit(false))).getOrElse(lit(false))
    // Change detection: ONE left join of the batch against the OPEN
    // slice (filter-pushed scan, key + tracked columns only). A batch
    // row survives as NEW (no open row, not a delete), CHANGED
    // (tracked attrs differ, not a delete), or a MATCHED DELETE
    // (close-only); everything else — the bulk of a mostly-unchanged
    // snapshot, and deletes of absent keys — claims no merge clause
    // and is dropped HERE, so the merge's stats prune + confirm scan
    // pay only for touched keys' candidate files.
    val detectCols = (key +: tracked).distinct
    val open = ManifestTable.read(spark, path)
      .filter(col(ValidTo).isNull)
      .select(detectCols.map(c => col(c).as(s"_c_$c")): _*)
    val changedCond = tracked
      .map(a => !(col(a) <=> col(s"_c_$a"))).reduce(_ || _)
    val flagged = batch
      .join(open, col(key) === col(s"_c_$key"), "left")
      .withColumn("_scd_del", isDel && col(s"_c_$key").isNotNull)
      .withColumn("_scd_chg",
        !isDel && col(s"_c_$key").isNotNull && changedCond)
      .withColumn("_scd_new", !isDel && col(s"_c_$key").isNull)
      .filter(col("_scd_del") || col("_scd_chg") || col("_scd_new"))
      .select(batch.columns.map(col) ++
        Seq(col("_scd_chg"), col("_scd_del")): _*)
    applyFlagged(spark, path, key, batch.columns.toSeq, flagged, tracked,
      ts, tag, seqCol)
  }

  /** The merge half of [[applyChanges]], taking an ALREADY-CLASSIFIED
    * batch: `flagged` carries the batch's columns plus `_scd_chg`
    * (tracked attributes differ from the key's open row) and
    * `_scd_del` (a delete event with an open row to close), with
    * no-claim rows (unchanged keys, deletes of absent keys) already
    * dropped. Split out in optimization round 19 so
    * [[ApplyChanges.applyScd2]] can classify and high-water-prune in
    * ONE pass over the dimension instead of two (its sequence rollup
    * and this detection used to be separate scans + joins). */
  private[pipeline] def applyFlagged(spark: SparkSession, path: String,
                                     key: String, batchCols: Seq[String],
                                     flagged: DataFrame,
                                     tracked: Seq[String],
                                     ts: Long, tag: Option[String],
                                     seqCol: Option[String]): Long = {
    require(tracked.nonEmpty, "SCD2 needs at least one tracked column")
    val dimCols = ManifestTable.read(spark, path).schema
    val seqName = ApplyChanges.SeqCol
    // GENERATED columns are not business columns: the batch must not
    // carry them (MERGE refuses assigning them; the merge staging pass
    // recomputes omitted ones from their declarations), so an SCD2
    // dimension with generated columns composes transparently
    val genCols = ManifestTable.generatedColumns(spark, path).keySet
    val bizCols = dimCols.fieldNames
      .filterNot(n => n == ValidFrom || n == ValidTo || n == seqName ||
        genCols.contains(n))
    require(bizCols.forall(batchCols.contains),
      s"SCD2 batch must carry the business columns ${bizCols.mkString(",")}")
    seqCol.foreach(sc => require(batchCols.contains(sc),
      s"SCD2 batch has no sequence column '$sc'"))
    val dimHasSeq = dimCols.fieldNames.contains(seqName)
    val keyType = dimCols(key).dataType
    // staged source: keyed copies (close-the-open-row for changed and
    // deleted keys, first-insert for new keys) plus null-keyed copies
    // of the CHANGED rows only (replacement inserts — a null key can
    // never match, so it reaches the insert clause; deletes emit no
    // replacement); the real key rides `_scd_key` into the insert
    // image. Built by exploding each row into its 1 or 2 copies —
    // one pass over the detection join, no self-union re-evaluation.
    // `_scd_key` rides a NULL guard: a null-keyed batch row can never
    // match (SQL join semantics), so every apply would re-insert it —
    // silent, unbounded duplication; the guard fails the batch loudly
    // at execution with zero extra jobs. (A null-keyed DELETE already
    // dropped at classification — a no-op like any absent key.)
    val staged = flagged
      .select(col("*"),
        explode(when(col("_scd_chg"), array(lit(false), lit(true)))
          .otherwise(array(lit(false)))).as("_scd_nullkey"))
      .withColumn("_scd_key",
        when(col(key).isNotNull, col(key)).otherwise(raise_error(lit(
          s"SCD2 batch carries a NULL '$key' — a null key can never " +
            "match and would re-insert on every apply"))))
      .withColumn(key, when(col("_scd_nullkey"), lit(null).cast(keyType))
        .otherwise(col(key)))
      .drop("_scd_chg", "_scd_nullkey")
    val pairChanged: Column = tracked
      .map(a => !(col(a) <=> col(s"_b_$a"))).reduce(_ || _)
    // sequence persistence: a delete-close records the DELETE's
    // sequence on the closed row (so the key's high-water survives
    // losing its open row — a late update can never resurrect it); a
    // change-close keeps the closed row's own opening sequence; the
    // replacement/new open row records its event's sequence. A target
    // without `_seq` evolves it in this merge commit (old rows read
    // NULL through schema-on-read).
    val updSet: Seq[(String, Column)] = seqCol match {
      case Some(sc) =>
        val carried =
          if (dimHasSeq) col(s"_b_$seqName")
          else lit(null).cast("long")
        Seq(ValidTo -> lit(ts),
          seqName -> when(col("_scd_del"), col(sc).cast("long"))
            .otherwise(carried))
      case None => Seq(ValidTo -> lit(ts))
    }
    val insSeq: Seq[(String, Column)] =
      seqCol.map(sc => seqName -> col(sc).cast("long")).toSeq
    ManifestTable.mergeMultiKeyed(
      staged, path, Seq(key),
      matched = Seq(ManifestTable.MergeUpdate(
        Some(col("_scd_del") || pairChanged), updSet)),
      notMatched = Seq(ManifestTable.MergeInsert(
        // a keyed delete copy always matches (classification required
        // an open row) — the guard is belt-and-braces against races
        Some(!col("_scd_del")),
        (key -> col("_scd_key")) +:
          bizCols.filterNot(_ == key).map(c => c -> col(c)).toSeq ++:
          insSeq :+
          (ValidFrom -> lit(ts)) :+
          (ValidTo -> lit(null).cast("long")))),
      residual = Some(col(s"_b_$ValidTo").isNull),
      schemaEvolution = seqCol.isDefined && !dimHasSeq,
      tag = tag)
  }

  /** Point-in-time view of the dimension: the rows whose validity
    * range covers `ts` — the SCD2 read idiom. */
  def asOf(spark: SparkSession, path: String, ts: Long): DataFrame =
    ManifestTable.read(spark, path)
      .filter(col(ValidFrom) <= ts &&
        (col(ValidTo).isNull || col(ValidTo) > ts))
}
