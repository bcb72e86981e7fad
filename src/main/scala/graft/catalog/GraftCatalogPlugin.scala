package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, StagedTable, StagingTableCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark `CatalogPlugin` reserving the `graft` catalog NAMESPACE so
  * multipart identifiers (`graft.db.t`) route to this library instead
  * of being misparsed as session-catalog namespaces
  * (REQUIRES_SINGLE_PART_NAMESPACE otherwise). Auto-registered by
  * [[graft.plans.GraftExtensions]] (`spark.sql.catalog.graft`); can
  * also be wired explicitly, the Delta-catalog idiom the reference's
  * platform uses (`/root/reference/src/etl_pipeline.py:36-37`).
  *
  * Deliberate division of labor: this plugin answers NAMESPACE and
  * EXISTENCE questions (SHOW NAMESPACES / tableExists / DROP), while
  * RELATION RESOLUTION stays with the injected analyzer rule
  * ([[graft.plans.GraftNameResolution]]) — `loadTable` defers with
  * `NoSuchTableException`, which Spark's relation resolution treats as
  * "not mine", leaving the unresolved relation for the rule to replace
  * with the manifest-governed scan. That keeps name reads on the SAME
  * vectorized parquet plan as path reads; a DataSourceV2 `Table` here
  * would force a hand-rolled row-at-a-time reader into every name
  * query — strictly slower at any scale.
  */
class GraftCatalogPlugin extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = GraftCatalog.CatalogName

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def db(namespace: Array[String]): String = {
    if (namespace.length != 1)
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    namespace.head
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.listTables(spark, db(namespace))
      .map { case (t, _) => Identifier.of(namespace, t) }.toArray

  /** Returns a METADATA SHELL (name + manifest schema, no read/write
    * capabilities): enough for third-party tooling that inspects
    * tables through the TableCatalog API, and for Spark's
    * ResolveRelations to claim the identifier BEFORE ResolveSQLOnFile
    * can misread 2-part `graft.t` as SQL-on-file (the `graft` short
    * name is a registered data source since round 13). The resulting
    * DataSourceV2Relation is swapped for the manifest-governed
    * vectorized scan by [[graft.plans.GraftNameResolution]] in the
    * same resolution batch — physical planning never sees the shell.
    */
  override def loadTable(ident: Identifier): Table = {
    val parts = catalogName +: ident.namespace.toSeq :+ ident.name
    GraftCatalog.resolve(spark, parts)
      .filter(p => graft.pipeline.ManifestTable
        .currentVersion(spark, p).isDefined)
      .map { p =>
        val v = graft.pipeline.ManifestTable.currentVersion(spark, p).get
        val schema = graft.pipeline.ManifestTable
          .manifestSchema(spark, p, v)
          .getOrElse(graft.pipeline.ManifestTable.read(spark, p).schema)
        GraftShellTable((ident.namespace.toSeq :+ ident.name).mkString("."),
          schema, Some(p),
          tableProps = graft.pipeline.ManifestTable
            .tableProperties(spark, p))
      }
      .getOrElse(throw new NoSuchTableException(ident))
  }

  /** SQL time travel on names — `FROM graft.db.t VERSION AS OF n`.
    * The shell pins the version; the analyzer rule swaps in the
    * pinned manifest scan (schema = that version's committed schema,
    * so evolution boundaries travel correctly). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val base = loadTable(ident).asInstanceOf[GraftShellTable]
    val v = version.toLong
    val p = base.path.get
    val schema = graft.pipeline.ManifestTable.manifestSchema(spark, p, v)
      .getOrElse(graft.pipeline.ManifestTable
        .readVersion(spark, p, v).schema)
    base.copy(tableSchema = schema, pinnedVersion = Some(v))
  }

  /** `FROM graft.db.t TIMESTAMP AS OF ts` — `timestamp` arrives in
    * MICROseconds since epoch (the TableCatalog contract). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val base = loadTable(ident).asInstanceOf[GraftShellTable]
    val ms = timestamp / 1000L
    val schema = graft.pipeline.ManifestTable
      .readAsOfTimestamp(spark, base.path.get, ms).schema
    base.copy(tableSchema = schema, pinnedTimestampMs = Some(ms))
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftCatalog.resolve(spark,
        catalogName +: ident.namespace.toSeq :+ ident.name)
      .exists(p => graft.pipeline.ManifestTable
        .currentVersion(spark, p).isDefined)

  /** Plain empty-table DDL (`CREATE TABLE graft.db.t (cols...)`) —
    * declare-schema-then-ingest, the Delta norm. Identity transforms
    * only (k=v partition columns); the returned Table is a metadata
    * shell for CreateTableExec's contract — reads keep resolving
    * through the analyzer rule (class doc). */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val nm = (ident.namespace.toSeq :+ ident.name).mkString(".")
    GraftCatalog.createTable(spark, nm, schema,
      GraftCatalogPlugin.partitionColsOf(partitions))
    val user = GraftCatalogPlugin.userProps(properties)
    if (user.nonEmpty)
      graft.pipeline.ManifestTable.setProperties(spark,
        GraftCatalog.tablePath(spark, nm), user): Unit
    GraftShellTable(nm, schema, None)
  }

  // --- staged CTAS / RTAS (StagingTableCatalog) -----------------------
  //
  // `df.writeTo(t).createOrReplace()/.replace()` and SQL
  // `CREATE OR REPLACE TABLE graft.db.t AS SELECT`. A ManifestTable
  // snapshot-overwrite commit IS atomic (staged files + one
  // conditional manifest publish), so the staged table defers
  // everything to the write itself: commit is a no-op (the manifest
  // publish was the atomic point) and abort is a no-op (a failed
  // write never published — orphaned staging files fall to vacuum's
  // discipline like any crashed writer). REPLACE is therefore
  // HISTORY-PRESERVING, the Delta semantics: the previous snapshot
  // stays time-travelable, unlike drop-and-recreate.

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String])
      : StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    GraftStagedTable((ident.namespace.toSeq :+ ident.name).mkString("."),
      schema, GraftCatalogPlugin.partitionColsOf(partitions),
      GraftCatalogPlugin.userProps(properties))
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: java.util.Map[String, String])
      : StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    GraftStagedTable((ident.namespace.toSeq :+ ident.name).mkString("."),
      schema, GraftCatalogPlugin.partitionColsOf(partitions),
      GraftCatalogPlugin.userProps(properties))
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: java.util.Map[String, String])
      : StagedTable =
    GraftStagedTable((ident.namespace.toSeq :+ ident.name).mkString("."),
      schema, GraftCatalogPlugin.partitionColsOf(partitions),
      GraftCatalogPlugin.userProps(properties))

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "alter graft tables with the ALTER TABLE graft SQL verbs")

  override def dropTable(ident: Identifier): Boolean = {
    val nm = (ident.namespace.toSeq :+ ident.name).mkString(".")
    try { GraftCatalog.dropTable(spark, nm); true }
    catch { case _: IllegalArgumentException => false }
  }

  /** `DROP TABLE graft.db.t PURGE` routed through Spark's catalog path
    * (the default TableCatalog.purgeTable throws
    * UnsupportedOperationException — external tables would otherwise
    * be undroppable-with-data via SQL). */
  override def purgeTable(ident: Identifier): Boolean = {
    val nm = (ident.namespace.toSeq :+ ident.name).mkString(".")
    try { GraftCatalog.dropTable(spark, nm, purge = true); true }
    catch { case _: IllegalArgumentException => false }
  }

  /** `ALTER TABLE graft.db.t RENAME TO graft.db2.t2` — managed tables
    * move their directory (one fs rename), external tables re-point
    * the registration. Same-warehouse shallow clones of the source
    * break, exactly as under DROP (see [[GraftCatalog.renameTable]]).
    */
  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    GraftCatalog.renameTable(spark,
      (oldIdent.namespace.toSeq :+ oldIdent.name).mkString("."),
      (newIdent.namespace.toSeq :+ newIdent.name).mkString("."))

  // --- namespaces: warehouse subdirectories ---

  override def listNamespaces(): Array[Array[String]] = {
    val wh = new org.apache.hadoop.fs.Path(GraftCatalog.warehouse(spark))
    val f = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(wh)) Array.empty
    else f.listStatus(wh).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && {
      val p = new org.apache.hadoop.fs.Path(
        s"${GraftCatalog.warehouse(spark)}/${namespace.head}")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(
      s"${GraftCatalog.warehouse(spark)}/${db(namespace)}")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata to alter")

  /** CASCADE deletes the warehouse subdirectory recursively — standard
    * Spark semantics, with one graft-specific hazard worth naming:
    * SAME-WAREHOUSE shallow clones referencing files under the dropped
    * database break (clone refs are filesystem-qualified, so external
    * clones survive). Audit clones before a cascade drop, as before
    * VACUUM.
    */
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val d = db(namespace)
    require(cascade || GraftCatalog.listTables(spark, d).isEmpty,
      s"namespace '$d' is not empty (use CASCADE)")
    val p = new org.apache.hadoop.fs.Path(
      s"${GraftCatalog.warehouse(spark)}/$d")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}

private[graft] object GraftCatalogPlugin {

  /** Identity transforms only (k=v partition columns) — the layout
    * ManifestTable's snapshot directories express. */
  private[graft] def partitionColsOf(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map { t =>
      val refs = t.references()
      require(t.name() == "identity" && refs.length == 1,
        s"graft tables partition by plain columns only, got $t")
      refs.head.fieldNames().mkString(".")
    }

  /** Spark routes engine-internal table options (provider, location,
    * comment, ...) through the same properties map as user
    * TBLPROPERTIES — keep only the user's keys. `graft.`-reserved keys
    * flow through so [[graft.pipeline.ManifestTable.setProperties]]
    * can refuse them loudly. */
  private[graft] def userProps(
      properties: java.util.Map[String, String]): Map[String, String] = {
    val internal = Set("provider", "location", "comment", "owner",
      "external", "is_managed_location")
    val out = scala.collection.mutable.Map.empty[String, String]
    properties.forEach { (k, v) =>
      if (!internal.contains(k.toLowerCase) && !k.startsWith("option."))
        out += k -> v
    }
    out.toMap
  }
}

/** Atomic-CTAS/RTAS staged table ([[GraftCatalogPlugin.stageCreate]]
  * family): the query result arrives through the V1-fallback write
  * builder and lands as ONE ManifestTable snapshot commit —
  * create = the table's first version, replace = a history-preserving
  * overwrite commit (previous snapshots stay time-travelable, Delta's
  * REPLACE semantics). Declared TBLPROPERTIES land right after the
  * data commit.
  */
private[graft] case class GraftStagedTable(
    tableName: String, tableSchema: StructType,
    partitionCols: Seq[String],
    userProps: Map[String, String]) extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[
    org.apache.spark.sql.connector.catalog.TableCapability] = {
    import org.apache.spark.sql.connector.catalog.TableCapability._
    java.util.EnumSet.of(V1_BATCH_WRITE, TRUNCATE, OVERWRITE_BY_FILTER)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    // SupportsOverwrite because the RTAS exec expresses "replace the
    // table content" as a truncate-overwrite; the filters are ignored —
    // the staged write IS the full new snapshot either way
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsOverwrite {
      override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
          : org.apache.spark.sql.connector.write.WriteBuilder = this
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean): Unit = {
                val spark = data.sparkSession
                val path = GraftCatalog.tablePath(spark, tableName)
                graft.pipeline.ManifestTable.write(data, path,
                  partitionCols = partitionCols): Unit
                if (userProps.nonEmpty)
                  graft.pipeline.ManifestTable.setProperties(spark, path,
                    userProps): Unit
              }
            }
        }
    }

  /** The ManifestTable commit inside the write was the atomic point. */
  override def commitStagedChanges(): Unit = ()
  /** A failed write never published a manifest; staged orphans fall to
    * vacuum's version-dir discipline like any crashed writer. */
  override def abortStagedChanges(): Unit = ()
}

/** Metadata Table handed back by [[GraftCatalogPlugin]] to satisfy
  * the TableCatalog contract (createTable's return, loadTable's claim
  * on the identifier). It advertises NO read capabilities on purpose —
  * resolution stays with the analyzer rule
  * ([[graft.plans.GraftNameResolution]]), ONE vectorized read path —
  * but it IS writable (round 13): `V1_BATCH_WRITE` routes
  * `df.writeTo("graft.db.t")` / V2 CTAS through Spark's V1-fallback
  * write exec into the same [[graft.pipeline.ManifestTable]] commit
  * paths as every other surface (see [[GraftWriteBuilder]]). `path`
  * carries the resolved storage location so rule and writer need no
  * second catalog lookup.
  */
private[graft] case class GraftShellTable(
    tableName: String, tableSchema: StructType,
    path: Option[String],
    pinnedVersion: Option[Long] = None,
    pinnedTimestampMs: Option[Long] = None,
    tableProps: Map[String, String] = Map.empty) extends Table
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  /** User TBLPROPERTIES — surfaced for third-party tooling that
    * inspects tables through the TableCatalog API. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    tableProps.foreach { case (k, v) => m.put(k, v): Unit }
    m
  }
  override def capabilities(): java.util.Set[
    org.apache.spark.sql.connector.catalog.TableCapability] = {
    import org.apache.spark.sql.connector.catalog.TableCapability._
    java.util.EnumSet.of(V1_BATCH_WRITE, TRUNCATE, OVERWRITE_BY_FILTER)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(this)
}
