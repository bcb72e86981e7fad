package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
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
class GraftCatalogPlugin extends TableCatalog with SupportsNamespaces {

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

  /** Resolution is the analyzer rule's job — see class doc. */
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)

  override def tableExists(ident: Identifier): Boolean =
    GraftCatalog.resolve(spark,
        catalogName +: ident.namespace.toSeq :+ ident.name)
      .exists(p => graft.pipeline.ManifestTable
        .currentVersion(spark, p).isDefined)

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "create graft tables with CREATE TABLE graft.db.t AS SELECT ... " +
        "or GraftCatalog.saveAsTable (the graft SQL verbs)")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "alter graft tables with the ALTER TABLE graft SQL verbs")

  override def dropTable(ident: Identifier): Boolean = {
    val nm = (ident.namespace.toSeq :+ ident.name).mkString(".")
    try { GraftCatalog.dropTable(spark, nm); true }
    catch { case _: IllegalArgumentException => false }
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables rename by external re-registration " +
        "(CREATE TABLE graft.db.new LOCATION ...; DROP TABLE graft.db.old)")

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
