package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, StagedTable, StagingTableCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
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
    // validate the declared property set BEFORE the empty-schema commit
    // publishes — a typo'd reserved key must not leave a half-applied
    // table (row tracking IS declarable here: the table is empty)
    val (reserved, user) = GraftCatalogPlugin.splitValidated(
      GraftCatalogPlugin.userProps(properties), allowRowTracking = true)
    GraftCatalog.createTable(spark, nm, schema,
      GraftCatalogPlugin.partitionColsOf(partitions))
    val path = GraftCatalog.tablePath(spark, nm)
    GraftCatalogPlugin.applyReserved(spark, path, reserved)
    if (user.nonEmpty)
      graft.pipeline.ManifestTable.setProperties(spark, path, user): Unit
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
    staged(ident, schema, partitions, properties)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: java.util.Map[String, String])
      : StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    staged(ident, schema, partitions, properties)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: java.util.Map[String, String])
      : StagedTable =
    staged(ident, schema, partitions, properties)

  /** Declared properties validate and route at STAGE time (before the
    * query runs, let alone commits); the staged insert then publishes
    * the declared user map WHOLESALE — REPLACE resets metadata to the
    * declared set (Delta's RTAS rule), it never inherits stale keys
    * from the replaced table. */
  private def staged(ident: Identifier, schema: StructType,
                     partitions: Array[Transform],
                     properties: java.util.Map[String, String])
      : GraftStagedTable = {
    val (reserved, user) = GraftCatalogPlugin.splitValidated(
      GraftCatalogPlugin.userProps(properties), allowRowTracking = false)
    GraftStagedTable((ident.namespace.toSeq :+ ident.name).mkString("."),
      schema, GraftCatalogPlugin.partitionColsOf(partitions),
      user, reservedProps = reserved,
      // captured at STAGE time: commitStagedChanges for the no-query
      // REPLACE form must resolve warehouse/externals through the
      // session that staged the table, not whichever session happens
      // to be active at commit in a multi-session application
      stagedSession = SparkSession.active)
  }

  /** V2 `alterTable` — the programmatic TableCatalog path third-party
    * tooling calls (the SQL verbs route through the injected parser
    * and never reach here). Each change dispatches into the SAME
    * ManifestTable operator its SQL twin uses, one metadata commit per
    * change; unsupported change classes refuse loudly rather than
    * half-apply. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.{TableChange => TC}
    val path = GraftCatalog.resolve(spark,
        catalogName +: ident.namespace.toSeq :+ ident.name)
      .filter(p => graft.pipeline.ManifestTable
        .currentVersion(spark, p).isDefined)
      .getOrElse(throw new NoSuchTableException(ident))
    def topLevel(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"graft tables alter top-level columns only, " +
          s"got ${fieldNames.mkString(".")}")
      fieldNames.head
    }
    // VALIDATE the whole change list before applying any of it — each
    // change is one commit, so a bad later change must not leave the
    // earlier ones half-applied. Every check runs EAGERLY here
    // (topLevel is a real call, not a lazy require-message; the
    // row-tracking emptiness invariant probes now, not at apply time).
    changes.foreach {
      case a: TC.AddColumn =>
        val c = topLevel(a.fieldNames)
        require(a.isNullable,
          s"cannot add non-nullable column '$c' — existing rows would " +
            "read NULL; add nullable, backfill, then SET NOT NULL")
      case r: TC.RenameColumn => topLevel(r.fieldNames): Unit
      case d: TC.DeleteColumn => topLevel(d.fieldNames): Unit
      case n: TC.UpdateColumnNullability => topLevel(n.fieldNames): Unit
      case p: TC.SetProperty =>
        val (reserved, _) = GraftCatalogPlugin.splitValidated(
          Map(p.property -> p.value), allowRowTracking = true)
        if (reserved.get("graft.enablerowtracking").exists(_.toBoolean))
          require(graft.pipeline.ManifestTable
              .currentVersion(spark, path).forall { v =>
            val st = graft.pipeline.ManifestTable
              .resolveState(spark, path, v)
            st.files.isEmpty || graft.pipeline.ManifestTable
              .read(spark, path).limit(1).isEmpty
          }, s"cannot enable row tracking on non-empty $path — ids " +
            "must exist from the first write to be stable")
      case _: TC.RemoveProperty => ()
      case other => throw new UnsupportedOperationException(
        s"ALTER change ${other.getClass.getSimpleName} is not supported " +
          "on graft tables")
    }
    changes.foreach {
      case a: TC.AddColumn =>
        // nullable-only (validated above): existing rows read the new
        // column as NULL through schema-on-read
        graft.pipeline.ManifestTable.addColumns(spark, path,
          StructType(Seq(StructField(topLevel(a.fieldNames),
            a.dataType(), nullable = true)))): Unit
      case r: TC.RenameColumn =>
        graft.pipeline.ManifestTable.renameColumn(spark, path,
          topLevel(r.fieldNames), r.newName): Unit
      case d: TC.DeleteColumn =>
        graft.pipeline.ManifestTable.dropColumn(spark, path,
          topLevel(d.fieldNames)): Unit
      case n: TC.UpdateColumnNullability =>
        if (n.nullable)
          graft.pipeline.ManifestTable.dropNotNull(spark, path,
            topLevel(n.fieldNames)): Unit
        else
          graft.pipeline.ManifestTable.setNotNull(spark, path,
            topLevel(n.fieldNames)): Unit
      case p: TC.SetProperty =>
        val (reserved, user) = GraftCatalogPlugin.splitValidated(
          Map(p.property -> p.value), allowRowTracking = true)
        GraftCatalogPlugin.applyReserved(spark, path, reserved)
        if (user.nonEmpty)
          graft.pipeline.ManifestTable.setProperties(spark, path,
            user): Unit
      case p: TC.RemoveProperty =>
        graft.pipeline.ManifestTable.unsetProperties(spark, path,
          Seq(p.property)): Unit
      case other => throw new UnsupportedOperationException(
        s"ALTER change ${other.getClass.getSimpleName} is not supported " +
          "on graft tables")
    }
    loadTable(ident)
  }

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
    * TBLPROPERTIES — keep only the user's keys (including
    * `graft.`-reserved ones, which [[splitValidated]] then routes to
    * engine features or refuses BEFORE anything commits). */
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

  /** Engine features addressable through reserved `graft.*` property
    * keys — the same routing the SQL `SET TBLPROPERTIES` verb applies
    * ([[graft.plans.GraftSetPropertiesCommand]]). */
  private[graft] val ReservedKeys: Set[String] = Set(
    "graft.minreaderversion", "graft.minwriterversion",
    "graft.enablerowtracking")

  /** Split declared TBLPROPERTIES into (reserved engine features with
    * lowercased keys, user keys), VALIDATING names and values up front
    * — CREATE/CTAS must refuse a bad declaration before any commit
    * publishes, or the failure leaves a half-applied table.
    * `allowRowTracking = false` for CTAS/RTAS: row tracking enables on
    * an EMPTY table only (the feature's invariant), which a staged
    * write can never satisfy at apply time — refuse at DDL time with
    * the workable recipe instead. */
  private[graft] def splitValidated(props: Map[String, String],
                                    allowRowTracking: Boolean)
      : (Map[String, String], Map[String, String]) = {
    val (res, user) = props.partition(_._1.toLowerCase.startsWith("graft."))
    val rm = res.map { case (k, v) => (k.toLowerCase, v) }
    rm.foreach { case (k, v) =>
      require(ReservedKeys.contains(k),
        s"unknown reserved property '$k' — graft.* keys name engine " +
          "features (minReaderVersion, minWriterVersion, " +
          "enableRowTracking); user keys must not use the prefix")
      if (k == "graft.enablerowtracking") {
        require(allowRowTracking,
          "graft.enableRowTracking cannot be declared on CTAS/RTAS — " +
            "row tracking enables on an EMPTY table; CREATE the table, " +
            "set the property, then ingest")
        require(v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
          s"graft.enableRowTracking expects true/false, got '$v'")
      } else {
        require(v.trim.nonEmpty && v.trim.forall(_.isDigit),
          s"$k expects an integer protocol version, got '$v'")
        // the ceiling is part of up-front validation too — a protocol
        // this library cannot implement must refuse before the query
        // runs, not after its data commit published
        val ceiling =
          if (k == "graft.minreaderversion")
            graft.pipeline.ManifestTable.SupportedReaderVersion
          else graft.pipeline.ManifestTable.SupportedWriterVersion
        require(v.trim.toInt <= ceiling,
          s"$k=$v exceeds this library's own protocol ceiling " +
            s"($ceiling) — a client must implement the protocol it " +
            "declares (Delta's rule)")
      }
    }
    (rm, user)
  }

  /** Apply validated reserved keys to a committed table — protocol
    * upgrade first (row tracking may require it), then the feature
    * enables. Mirrors [[graft.plans.GraftSetPropertiesCommand]]. */
  private[graft] def applyReserved(spark: SparkSession, path: String,
                                   rm: Map[String, String]): Unit = {
    if (rm.contains("graft.minreaderversion") ||
        rm.contains("graft.minwriterversion")) {
      val cur = graft.pipeline.ManifestTable.currentVersion(spark, path)
        .map(graft.pipeline.ManifestTable.resolveState(spark, path, _))
      graft.pipeline.ManifestTable.upgradeProtocol(spark, path,
        rm.get("graft.minreaderversion").map(_.trim.toInt)
          .orElse(cur.map(_.minReader)).getOrElse(1),
        rm.get("graft.minwriterversion").map(_.trim.toInt)
          .orElse(cur.map(_.minWriter)).getOrElse(1)): Unit
    }
    if (rm.get("graft.enablerowtracking").exists(_.toBoolean))
      graft.pipeline.ManifestTable.enableRowTracking(spark, path): Unit
  }
}

/** Atomic-CTAS/RTAS staged table ([[GraftCatalogPlugin.stageCreate]]
  * family): the query result arrives through the V1-fallback write
  * builder and lands as ONE ManifestTable snapshot commit —
  * create = the table's first version, replace = a history-preserving
  * overwrite commit (previous snapshots stay time-travelable, Delta's
  * REPLACE semantics). Declared TBLPROPERTIES land right after the
  * data commit — as the table's ENTIRE user map (wholesale publish:
  * REPLACE resets properties to the declared set, Delta's rule), with
  * pre-validated reserved keys routed to their engine features.
  */
private[graft] case class GraftStagedTable(
    tableName: String, tableSchema: StructType,
    partitionCols: Seq[String],
    userProps: Map[String, String],
    reservedProps: Map[String, String] = Map.empty,
    stagedSession: SparkSession = null) extends StagedTable
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
                GraftCatalogPlugin.applyReserved(spark, path, reservedProps)
                // wholesale, not a merge: the declared set IS the map
                // (drops the replaced table's stale keys; no-op commit
                // elided when already equal — fresh creates with no
                // declared keys publish nothing extra)
                graft.pipeline.ManifestTable.replaceProperties(spark, path,
                  userProps): Unit
                wroteData = true
              }
            }
        }
    }

  /** Whether the staged write ran — `REPLACE TABLE t (cols)` WITHOUT
    * `AS SELECT` commits through commitStagedChanges with no insert. */
  @volatile private var wroteData = false

  /** The ManifestTable commit inside the write was the atomic point —
    * EXCEPT for the no-query form (`[CREATE OR] REPLACE TABLE t (cols)`,
    * Spark's AtomicReplaceTableExec calls stage + commit with no write):
    * the declared schema replaces the content as an EMPTY
    * history-preserving overwrite, with the declared properties
    * published wholesale like any other replace. */
  override def commitStagedChanges(): Unit = if (!wroteData) {
    val spark = Option(stagedSession)
      .getOrElse(org.apache.spark.sql.SparkSession.active)
    val path = GraftCatalog.tablePath(spark, tableName)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)
    graft.pipeline.ManifestTable.write(empty, path,
      partitionColsDecl = partitionCols): Unit
    GraftCatalogPlugin.applyReserved(spark, path, reservedProps)
    graft.pipeline.ManifestTable.replaceProperties(spark, path,
      userProps): Unit
  }
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
