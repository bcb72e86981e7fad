package graft.plans

import graft.catalog.GraftCatalog
import graft.pipeline.ManifestTable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Analyzer rule resolving graft-addressed TABLE NAMES —
  * `spark.table("graft.db.t")`, `SELECT ... FROM graft.db.t`,
  * `FROM graft.t` — to the manifest-governed read plan, and
  * `spark.read.format("graft")` placeholder relations
  * ([[graft.sources.GraftRelation]]) to the same plan.
  *
  * Injected via the public `injectResolutionRule` hook
  * ([[GraftExtensions]]), the same mechanism Delta-class systems use
  * for name resolution. The substituted plan is EXACTLY
  * `ManifestTable.read(...)`'s analyzed plan: the vectorized parquet
  * scan over the committed file set with deletion vectors, column
  * mapping and stats semantics already applied — by construction there
  * is no second (slower, hand-rolled) read path for name-addressed
  * queries to fall onto.
  *
  * Unmatched relations pass through untouched for Spark's own
  * resolution; an unresolvable graft name keeps its UnresolvedRelation
  * so CheckAnalysis raises the standard TABLE_OR_VIEW_NOT_FOUND.
  */
case class GraftNameResolution(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // WRITE TARGETS stay relations: `df.writeTo("graft.db.t")` / V2
    // CTAS puts the table under AppendData/OverwriteByExpression (and
    // SQL INSERT under InsertIntoStatement) — swapping the TARGET for
    // a read plan would destroy the write. The V1-fallback write exec
    // consumes the shell relation directly (GraftWriteBuilder); only
    // read-position relations get the manifest-scan substitution.
    val writeTargets =
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]()
    plan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        writeTargets.put(w.table, java.lang.Boolean.TRUE): Unit
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        writeTargets.put(i.table, java.lang.Boolean.TRUE): Unit
      case _ => ()
    }
    def isWriteTarget(p: LogicalPlan): Boolean = writeTargets.containsKey(p)
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if !isWriteTarget(u) && u.multipartIdentifier.headOption
            .exists(_.equalsIgnoreCase(GraftCatalog.CatalogName)) =>
        GraftCatalog.resolve(session, u.multipartIdentifier) match {
          case Some(path)
              if ManifestTable.currentVersion(session, path).isDefined =>
            // Delta's read-option time travel composes with names:
            //   spark.read.option("versionAsOf", 3).table("graft.db.t")
            //   spark.read.option("timestampAsOf", ts).table(...)
            val df =
              if (u.options.containsKey("versionAsOf"))
                ManifestTable.readVersion(session, path,
                  u.options.get("versionAsOf").toLong)
              else if (u.options.containsKey("timestampAsOf"))
                ManifestTable.readAsOfTimestamp(session, path,
                  GraftSqlCommands.parseTimestampMillis(
                    u.options.get("timestampAsOf")))
              else ManifestTable.read(session, path)
            df.queryExecution.analyzed
          case _ => u
        }

      // ResolveRelations path: the catalog plugin's loadTable claims
      // graft identifiers with a capability-less shell (so 2-part
      // `graft.t` can't be misread as SQL-on-file now that `graft` is
      // a registered source name); swap the shell relation for the
      // manifest plan here, honoring Delta's read-option time travel.
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if !isWriteTarget(r) &&
            r.table.isInstanceOf[graft.catalog.GraftShellTable] =>
        val shell = r.table.asInstanceOf[graft.catalog.GraftShellTable]
        val path = shell.path.getOrElse(
          GraftCatalog.tablePath(session, shell.tableName))
        // travel precedence: SQL `VERSION/TIMESTAMP AS OF` pins on the
        // shell (V2 loadTable overloads); else Delta's read options
        val df =
          if (shell.pinnedVersion.isDefined)
            ManifestTable.readVersion(session, path, shell.pinnedVersion.get)
          else if (shell.pinnedTimestampMs.isDefined)
            ManifestTable.readAsOfTimestamp(session, path,
              shell.pinnedTimestampMs.get)
          else if (r.options.containsKey("versionAsOf"))
            ManifestTable.readVersion(session, path,
              r.options.get("versionAsOf").toLong)
          else if (r.options.containsKey("timestampAsOf"))
            ManifestTable.readAsOfTimestamp(session, path,
              GraftSqlCommands.parseTimestampMillis(
                r.options.get("timestampAsOf")))
          else ManifestTable.read(session, path)
        val plan = df.queryExecution.analyzed
        Project(r.output.zip(plan.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId) }, plan)

      // format("graft") batch read: swap the V1 placeholder relation
      // for the manifest-governed vectorized scan BEFORE any physical
      // planning — name reads, path reads and format reads all share
      // ONE read path. The Project re-binds the scan's fresh attributes
      // onto the LogicalRelation's original exprIds so every operator
      // already referencing them stays resolved.
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[graft.sources.GraftRelation] =>
        val plan = lr.relation.asInstanceOf[graft.sources.GraftRelation]
          .frame.queryExecution.analyzed
        Project(lr.output.zip(plan.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId) }, plan)
    }
  }
}
