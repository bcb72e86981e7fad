package graft.catalog

import graft.pipeline.ManifestTable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name-based table addressing over [[ManifestTable]] — the catalog
  * surface the reference's platform wires via its Delta catalog
  * (`/root/reference/src/etl_pipeline.py:36-37`: users say
  * `spark.table("db.t")` / `MERGE INTO db.t`, never a path string).
  *
  * Design: a WAREHOUSE-CONVENTION registry, not a metastore service.
  * A managed table named `graft.<db>.<t>` LIVES at
  * `<warehouse>/<db>/<t>` — existence of a committed manifest IS
  * registration, so creating a table is exactly one [[ManifestTable]]
  * write and the catalog adds zero commit-path I/O or coordination.
  * External tables (EXISTING paths adopted under a name) are the only
  * state the catalog stores: one tiny `_graft_catalog.json` per
  * database directory, rewritten atomically on (rare, driver-side)
  * register/unregister. Everything scales with the number of
  * databases, never with data.
  *
  * Resolution reaches SQL and the DataFrame API through two public
  * extension hooks, not a parallel read path:
  *
  *  - `spark.table("graft.db.t")` / `SELECT ... FROM graft.db.t`
  *    resolve via an injected analyzer rule
  *    ([[graft.plans.GraftNameResolution]]) that replaces the
  *    unresolved relation with the SAME manifest-governed scan the
  *    path API produces — vectorized parquet read, stats/DV/mapping
  *    all inherited; a custom DataSourceV2 reader would have
  *    abandoned that plan for a hand-rolled row reader.
  *  - the SQL verbs (MERGE INTO graft.db.t, OPTIMIZE graft.db.t, ...)
  *    accept the name spelling via [[graft.plans.GraftSqlParser]],
  *    which normalizes it to a `graft:db.t` path-spec resolved here at
  *    command run time.
  *
  * The warehouse root comes from `spark.graft.warehouse` (falling back
  * to `<spark.sql.warehouse.dir>/graft`), mirroring the Delta/Hive
  * warehouse-dir convention.
  */
object GraftCatalog {

  /** Catalog prefix in multipart identifiers: `graft.db.t` / `graft.t`. */
  val CatalogName = "graft"

  /** Pseudo-path prefix the SQL parser normalizes name targets to. */
  val PathSpecPrefix = "graft:"

  private val RegistryFile = "_graft_catalog.json"

  def warehouse(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.warehouse").getOrElse {
      val base = spark.conf.get("spark.sql.warehouse.dir")
        .stripSuffix("/")
      s"$base/graft"
    }

  /** `t` → (default, t); `db.t` → (db, t). */
  def splitName(name: String): (String, String) = {
    val parts = name.split("\\.").toSeq
    require(parts.nonEmpty && parts.size <= 2 && parts.forall(_.nonEmpty),
      s"table name must be 't' or 'db.t', got '$name'")
    if (parts.size == 1) ("default", parts.head) else (parts(0), parts(1))
  }

  /** Multipart identifier → storage path, when it is graft-addressed. */
  def resolve(spark: SparkSession, parts: Seq[String]): Option[String] =
    parts match {
      case Seq(c, db, t) if c.equalsIgnoreCase(CatalogName) =>
        Some(tablePath(spark, db, t))
      case Seq(c, t) if c.equalsIgnoreCase(CatalogName) =>
        Some(tablePath(spark, "default", t))
      case _ => None
    }

  /** A command target: either a literal path or a `graft:db.t` name
    * spec (what [[graft.plans.GraftSqlStatements]] normalizes name
    * spellings to). */
  def resolvePathSpec(spark: SparkSession, spec: String): String =
    if (!spec.startsWith(PathSpecPrefix)) spec
    else {
      val (db, t) = splitName(spec.stripPrefix(PathSpecPrefix))
      tablePath(spark, db, t)
    }

  /** Name → path: an external registration wins, else the managed
    * warehouse-convention location. */
  def tablePath(spark: SparkSession, db: String, table: String): String =
    externals(spark, db).getOrElse(table,
      s"${warehouse(spark)}/$db/$table")

  def tablePath(spark: SparkSession, name: String): String = {
    val (db, t) = splitName(name)
    tablePath(spark, db, t)
  }

  /** Read a table by name — same plan as the path read. */
  def table(spark: SparkSession, name: String): DataFrame =
    ManifestTable.read(spark, tablePath(spark, name))

  /** Write/append a DataFrame under a name (Delta's `saveAsTable`).
    * Managed location by convention; `mode` is "overwrite" (snapshot
    * replace — also the create verb) or "append" (transactional add).
    */
  def saveAsTable(df: DataFrame, name: String,
                  mode: String = "overwrite",
                  partitionCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val path = tablePath(spark, name)
    mode.toLowerCase match {
      case "overwrite" => ManifestTable.write(df, path,
        partitionCols = partitionCols)
      case "append"    => ManifestTable.append(df, path)
      case other => throw new IllegalArgumentException(
        s"saveAsTable mode must be overwrite|append, got '$other'")
    }
  }

  /** Declare-schema-then-ingest (Delta's plain `CREATE TABLE t (cols)`
    * empty-table DDL): commit an EMPTY manifest carrying `schema` at
    * the name's managed location, so constraints / identity /
    * clustering can be declared before the first byte of data and
    * every later write is schema-checked against the declaration.
    * `partitionCols` is validated against the schema and RECORDED in
    * the manifest (`partitionColsDecl`): the physical k=v layout
    * materializes with the first data overwrite, which inherits the
    * declaration unless the caller partitions explicitly.
    */
  def createTable(spark: SparkSession, name: String,
                  schema: org.apache.spark.sql.types.StructType,
                  partitionCols: Seq[String] = Nil): Unit = {
    val (db, t) = splitName(name)
    require(!externals(spark, db).contains(t) && !managedExists(spark, db, t),
      s"table '$db.$t' already exists")
    partitionCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column '$c' is not in the declared schema"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ManifestTable.write(empty, tablePath(spark, db, t),
      partitionColsDecl = partitionCols): Unit
  }

  /** Rename a table (Delta's `ALTER TABLE ... RENAME TO`), across
    * databases too. A MANAGED table moves its directory (one
    * filesystem rename — O(1) on posix/HDFS-class stores, no data
    * rewrite); an EXTERNAL table re-points its registration and the
    * data never moves. NOTE: same-warehouse shallow clones reference
    * the managed directory by absolute path — renaming the clone
    * SOURCE breaks them (the same hazard as DROP; external clones are
    * unaffected because refs are filesystem-qualified).
    */
  def renameTable(spark: SparkSession, oldName: String,
                  newName: String): Unit = {
    val (odb, ot) = splitName(oldName)
    val (ndb, nt) = splitName(newName)
    require(!externals(spark, ndb).contains(nt) &&
        !managedExists(spark, ndb, nt),
      s"rename target '$ndb.$nt' already exists")
    val oldExt = externals(spark, odb)
    if (oldExt.contains(ot)) {
      // external: registry re-point only (two atomic registry swaps
      // when crossing databases; rare driver-side admin op)
      val path = oldExt(ot)
      if (odb == ndb)
        writeRegistry(spark, odb, oldExt - ot + (nt -> path))
      else {
        writeRegistry(spark, ndb, externals(spark, ndb) + (nt -> path))
        writeRegistry(spark, odb, oldExt - ot)
      }
    } else {
      require(managedExists(spark, odb, ot), s"no table '$odb.$ot'")
      val src = new Path(s"${warehouse(spark)}/$odb/$ot")
      val dst = new Path(s"${warehouse(spark)}/$ndb/$nt")
      val f = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.mkdirs(dst.getParent)
      if (!f.rename(src, dst))
        throw new java.io.IOException(
          s"could not rename $src to $dst")
    }
  }

  /** Adopt an EXISTING table path under a catalog name (the external
    * table form — `CREATE TABLE graft.db.t LOCATION '<path>'`). The
    * path must hold a committed manifest; the registration is one
    * atomic registry rewrite, no data I/O. */
  def registerExternal(spark: SparkSession, name: String,
                       path: String): Unit = {
    val (db, t) = splitName(name)
    require(ManifestTable.currentVersion(spark, path).isDefined,
      s"cannot register '$name': no committed manifest at $path")
    require(!externals(spark, db).contains(t) &&
        !managedExists(spark, db, t),
      s"table '$db.$t' already exists")
    writeRegistry(spark, db, externals(spark, db) + (t -> path))
  }

  /** Drop a table by name. Managed tables delete their directory
    * (purge is implied — the location is catalog-owned); external
    * tables unregister, deleting data only when `purge`. */
  def dropTable(spark: SparkSession, name: String,
                purge: Boolean = false): Unit = {
    val (db, t) = splitName(name)
    val ext = externals(spark, db)
    if (ext.contains(t)) {
      writeRegistry(spark, db, ext - t)
      if (purge) {
        val p = new Path(ext(t))
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
    } else {
      require(managedExists(spark, db, t), s"no table '$db.$t'")
      val p = new Path(s"${warehouse(spark)}/$db/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
  }

  /** (table, path) pairs live in a database: managed dirs holding a
    * committed manifest plus external registrations, name-sorted. */
  def listTables(spark: SparkSession, db: String): Seq[(String, String)] = {
    val dbDir = new Path(s"${warehouse(spark)}/$db")
    val f = dbDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val managed: Seq[(String, String)] =
      if (!f.exists(dbDir)) Nil
      else f.listStatus(dbDir).toSeq
        .filter(s => s.isDirectory &&
          ManifestTable.currentVersion(spark, s.getPath.toString).isDefined)
        .map(s => s.getPath.getName -> s.getPath.toString)
    (managed ++ externals(spark, db).toSeq).sortBy(_._1)
  }

  private def managedExists(spark: SparkSession, db: String,
                            t: String): Boolean =
    ManifestTable.currentVersion(spark,
      s"${warehouse(spark)}/$db/$t").isDefined

  /** External-table registrations of one database (empty when none). */
  def externals(spark: SparkSession, db: String): Map[String, String] = {
    val reg = new Path(s"${warehouse(spark)}/$db/$RegistryFile")
    val f = reg.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(reg)) Map.empty
    else {
      val in = f.open(reg)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(bytes)
      val it = root.fields()
      val out = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        out += e.getKey -> e.getValue.asText()
      }
      out.result()
    }
  }

  private def writeRegistry(spark: SparkSession, db: String,
                            entries: Map[String, String]): Unit = {
    val dir = new Path(s"${warehouse(spark)}/$db")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    entries.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    val tmp = new Path(dir, s"$RegistryFile.${
      java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    // last-writer-wins swap: registrations are rare driver-side admin
    // ops; the data-plane commit protocol (LogStore) is not involved
    val dst = new Path(dir, RegistryFile)
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"could not publish registry $dst")
  }
}
