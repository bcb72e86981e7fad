package graft.api

import graft.catalog.GraftCatalog
import graft.pipeline.ManifestTable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, lit}

/** Fluent table handle — the delta-spark `DeltaTable` API shape, the
  * programmatic surface a reference user drives their tables with
  * (`DeltaTable.forPath(spark, p).update/delete/merge/...`,
  * the Delta Scala idiom the reference's platform builds on,
  * `/root/reference/src/etl_pipeline.py:36-37` wires that stack).
  * Every method is a thin rename into the SAME [[ManifestTable]]
  * operators the SQL verbs and the writers use — one engine, no
  * second code path to keep correct:
  *
  * {{{
  *   val t = GraftTable.forPath(spark, "/data/orders")   // or forName
  *   t.update(col("v") < 0, Map("v" -> lit(0)))
  *   t.delete(col("stale"))
  *   t.merge(updates, "id")
  *     .whenMatchedUpdateAll(condition = Some(col("u_v") > col("_b_v")))
  *     .whenNotMatchedInsertAll()
  *     .execute()
  *   t.optimize().executeZOrderBy("k1", "k2")
  *   t.restoreToVersion(3)
  * }}}
  *
  * Mutators return the committed version (the engine-wide convention)
  * rather than delta-spark's Unit — strictly more informative, drop
  * the value to match Delta code shape.
  */
final class GraftTable private (spark: SparkSession, val path: String) {

  /** The table's current snapshot as a DataFrame (manifest-governed
    * vectorized scan — DVs, column mapping, stats pruning applied). */
  def toDF: DataFrame = ManifestTable.read(spark, path)

  /** Snapshot as of a version / commit-wall-time timestamp. */
  def versionAsOf(v: Long): DataFrame =
    ManifestTable.readVersion(spark, path, v)
  def timestampAsOf(ts: String): DataFrame =
    ManifestTable.readAsOfTimestamp(spark, path,
      graft.plans.GraftSqlCommands.parseTimestampMillis(ts))

  /** DESCRIBE HISTORY / DESCRIBE DETAIL frames. */
  def history(): DataFrame = ManifestTable.history(spark, path)
  def detail(): DataFrame = ManifestTable.describeDetail(spark, path)

  // --- row-level DML ---------------------------------------------------

  /** Predicate UPDATE (CoW: only files holding matching rows rewrite). */
  def update(condition: Column, set: Map[String, Column]): Long =
    ManifestTable.updateWhere(spark, path, set.toSeq, condition)

  /** `updateExpr` — SQL-text assignments, delta-spark's twin form. */
  def updateExpr(condition: String, set: Map[String, String]): Long =
    update(expr(condition), set.map { case (c, e) => c -> expr(e) })

  /** Predicate DELETE (CoW); no-arg form is SQL's all-rows DELETE. */
  def delete(condition: Column): Long =
    ManifestTable.deleteWhere(spark, path, condition)
  def delete(condition: String): Long = delete(expr(condition))
  def delete(): Long = delete(lit(true))

  /** Keyed MERGE builder — key-equality join on `key` (the engine's
    * merge contract; delta-spark's free-form ON degenerates to exactly
    * this on every sane upsert). Clause conditions reference SOURCE
    * columns bare and TARGET columns as `_b_<col>`. */
  def merge(source: DataFrame, key: String): GraftMergeBuilder =
    new GraftMergeBuilder(this, source, Seq(key))

  /** COMPOSITE-key MERGE builder (`ON t.k1 = s.k1 AND t.k2 = s.k2`) —
    * the common multi-column natural-key upsert. Add a non-equi ON
    * remainder with [[GraftMergeBuilder.onResidual]]. */
  def merge(source: DataFrame, keys: Seq[String]): GraftMergeBuilder =
    new GraftMergeBuilder(this, source, keys)

  // --- layout / retention ----------------------------------------------

  /** OPTIMIZE builder: `executeCompaction()` bin-packs small files,
    * `executeZOrderBy(cols)` clusters on a Morton key. */
  def optimize(): GraftOptimizeBuilder = new GraftOptimizeBuilder(this)

  def vacuum(retainVersions: Int = 1): Seq[Long] =
    ManifestTable.vacuum(spark, path, retainVersions)
  def vacuumHours(retainHours: Double): Seq[Long] =
    ManifestTable.vacuumHours(spark, path, retainHours)

  def restoreToVersion(v: Long): Long =
    ManifestTable.restore(spark, path, v)
  def restoreToTimestamp(ts: String): Long = {
    val ms = graft.plans.GraftSqlCommands.parseTimestampMillis(ts)
    ManifestTable.restore(spark, path,
      ManifestTable.versionAsOfTimestamp(spark, path, ms).getOrElse(
        throw new IllegalArgumentException(
          s"no committed version at or before '$ts' at $path")))
  }

  def shallowClone(dst: String, version: Option[Long] = None): Long =
    ManifestTable.cloneShallow(spark, path, dst, version)

  def deepClone(dst: String, version: Option[Long] = None): Long =
    ManifestTable.cloneDeep(spark, path, dst, version)

  // --- metadata ---------------------------------------------------------

  def properties: Map[String, String] =
    ManifestTable.tableProperties(spark, path)
  def columnDefaults: Map[String, String] =
    ManifestTable.columnDefaults(spark, path)
  def setColumnDefault(column: String, exprSql: String): Long =
    ManifestTable.setColumnDefault(spark, path, column, exprSql)
  def dropColumnDefault(column: String): Long =
    ManifestTable.dropColumnDefault(spark, path, column)
  def setProperties(props: Map[String, String]): Long =
    ManifestTable.setProperties(spark, path, props)
  def unsetProperties(keys: Seq[String]): Long =
    ManifestTable.unsetProperties(spark, path, keys)

  def upgradeProtocol(minReader: Int, minWriter: Int): Long =
    ManifestTable.upgradeProtocol(spark, path, minReader, minWriter)

  /** delta-spark's `generate("symlink_format_manifest")` — export the
    * current snapshot's file list for Presto/Trino/Athena readers. */
  def generate(mode: String): Int = {
    require(mode.equalsIgnoreCase("symlink_format_manifest"),
      s"unknown GENERATE mode '$mode' — supported: symlink_format_manifest")
    ManifestTable.generateSymlinkManifest(spark, path)
  }

  def addConstraint(name: String, check: String): Long =
    ManifestTable.addCheckConstraint(spark, path, name, check)
  def dropConstraint(name: String): Long =
    ManifestTable.dropCheckConstraint(spark, path, name)

  def version: Long = ManifestTable.currentVersion(spark, path)
    .getOrElse(throw new IllegalStateException(
      s"no committed version at $path"))

  private[api] def session: SparkSession = spark
}

object GraftTable {

  /** Handle on a path table (fails fast when nothing is committed —
    * delta-spark's `forPath` contract). */
  def forPath(spark: SparkSession, path: String): GraftTable = {
    require(ManifestTable.currentVersion(spark, path).isDefined,
      s"no committed graft table at $path")
    new GraftTable(spark, path)
  }

  /** Handle on a catalog name (`db.t` / `graft.db.t`). */
  def forName(spark: SparkSession, name: String): GraftTable =
    forPath(spark, GraftCatalog.tablePath(spark,
      name.stripPrefix(s"${GraftCatalog.CatalogName}.")))

  /** Is there a committed graft table at `path`? (delta-spark's
    * `isDeltaTable`.) */
  def isGraftTable(spark: SparkSession, path: String): Boolean =
    ManifestTable.currentVersion(spark, path).isDefined
}

/** MERGE builder: clauses accumulate IN CALL ORDER and evaluate
  * first-clause-wins, exactly the SQL reading — any number of clauses
  * per kind ([[graft.pipeline.ManifestTable.mergeMulti]], round 13); a
  * matched row claimed by an earlier clause never reaches a later one;
  * an unconditional clause must be the last on its match side.
  * `execute()` runs ONE keyed copy-on-write merge commit. */
final class GraftMergeBuilder private[api] (table: GraftTable,
                                            source: DataFrame,
                                            keys: Seq[String]) {
  private val matched =
    scala.collection.mutable.ArrayBuffer.empty[ManifestTable.MergeMatched]
  private val notMatched =
    scala.collection.mutable.ArrayBuffer.empty[ManifestTable.MergeInsert]
  private val bySource =
    scala.collection.mutable.ArrayBuffer.empty[ManifestTable.MergeMatched]
  private var evolve: Boolean = false
  private var residual: Option[Column] = None

  /** Non-equi remainder of the ON condition (Delta's `ON t.k = s.k
    * AND t.date > s.start`): a predicate over the resolved frame
    * (source columns bare, target columns `_b_<col>`). A key-equal
    * pair failing it is NOT matched — its source row reaches the
    * insert clauses, its target row the by-source clauses. */
  def onResidual(condition: Column): this.type = {
    residual = Some(condition); this
  }

  /** WHEN MATCHED [AND cond] THEN UPDATE SET * */
  def whenMatchedUpdateAll(condition: Option[Column] = None): this.type = {
    matched += ManifestTable.MergeUpdate(condition); this
  }

  /** WHEN MATCHED [AND cond] THEN UPDATE SET c = e, ... */
  def whenMatchedUpdate(set: Map[String, Column],
                        condition: Option[Column] = None): this.type = {
    require(set.nonEmpty, "UPDATE needs at least one assignment")
    matched += ManifestTable.MergeUpdate(condition, set.toSeq); this
  }
  def whenMatchedUpdateExpr(set: Map[String, String],
                            condition: Option[String] = None): this.type =
    whenMatchedUpdate(set.map { case (c, e) => c -> expr(e) },
      condition.map(expr))

  /** WHEN MATCHED [AND cond] THEN DELETE */
  def whenMatchedDelete(condition: Option[Column] = None): this.type = {
    matched += ManifestTable.MergeDelete(condition); this
  }

  /** WHEN NOT MATCHED [AND cond] THEN INSERT * */
  def whenNotMatchedInsertAll(condition: Option[Column] = None): this.type = {
    notMatched += ManifestTable.MergeInsert(condition); this
  }

  /** WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (es) */
  def whenNotMatchedInsert(values: Map[String, Column],
                           condition: Option[Column] = None): this.type = {
    require(values.nonEmpty, "INSERT needs at least one value")
    notMatched += ManifestTable.MergeInsert(condition, values.toSeq); this
  }
  def whenNotMatchedInsertExpr(values: Map[String, String],
                               condition: Option[String] = None): this.type =
    whenNotMatchedInsert(values.map { case (c, e) => c -> expr(e) },
      condition.map(expr))

  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET c = e, ...
    * (delta-spark's `whenNotMatchedBySourceUpdate`): acts on TARGET
    * rows without a source match — conditions/expressions reference
    * the target row as `_b_<col>`; explicit SET only (there is no
    * source row to take a star image from). */
  def whenNotMatchedBySourceUpdate(set: Map[String, Column],
                                   condition: Option[Column] = None)
      : this.type = {
    require(set.nonEmpty, "UPDATE needs at least one assignment")
    bySource += ManifestTable.MergeUpdate(condition, set.toSeq); this
  }
  def whenNotMatchedBySourceUpdateExpr(set: Map[String, String],
                                       condition: Option[String] = None)
      : this.type =
    whenNotMatchedBySourceUpdate(set.map { case (c, e) => c -> expr(e) },
      condition.map(expr))

  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE — the
    * sync-to-source delete; works with a keys-only source. */
  def whenNotMatchedBySourceDelete(condition: Option[Column] = None)
      : this.type = {
    bySource += ManifestTable.MergeDelete(condition); this
  }

  /** Delta's `withSchemaEvolution()` — additive source columns evolve
    * the table in the same commit (star forms only). */
  def withSchemaEvolution(): this.type = { evolve = true; this }

  /** Run the merge; returns the committed version. */
  def execute(): Long =
    ManifestTable.mergeMultiKeyed(source, table.path, keys,
      matched.toSeq, notMatched.toSeq,
      notMatchedBySource = bySource.toSeq, schemaEvolution = evolve,
      residual = residual)
}

/** OPTIMIZE builder (delta-spark's `DeltaOptimizeBuilder`). */
final class GraftOptimizeBuilder private[api] (table: GraftTable) {
  private var whereCond: Option[Column] = None

  /** Restrict compaction to files the predicate touches (partition or
    * stats-pruned slice). */
  def where(condition: String): this.type = {
    whereCond = Some(expr(condition)); this
  }

  /** Bin-pack small files — the SQL OPTIMIZE default shape (~128 MiB
    * target files); with `where()`, only matching partitions rewrite. */
  def executeCompaction(): Long = whereCond match {
    case Some(c) =>
      ManifestTable.compactWhere(table.session, table.path, c)
    case None =>
      ManifestTable.compactToFileSize(table.session, table.path, 128L << 20)
  }

  /** Z-order cluster on the given columns (Morton interleave; the
    * SQL `OPTIMIZE ... ZORDER BY` engine path — 2-column fast path,
    * 3..8-column general form; file count preserved like the verb). */
  def executeZOrderBy(cols: String*): Long = {
    require(whereCond.isEmpty,
      "ZORDER rewrites the clustered key space whole — drop where()")
    require(cols.length >= 2 && cols.length <= 8,
      s"ZORDER BY takes 2..8 columns, got ${cols.length}")
    val n = math.max(1, ManifestTable.resolveState(table.session,
      table.path, table.version).files.size)
    if (cols.length == 2)
      ManifestTable.optimizeZOrder(table.session, table.path,
        cols(0), cols(1), n)
    else ManifestTable.optimizeZOrderN(table.session, table.path,
      cols.toSeq, n)
  }
}
