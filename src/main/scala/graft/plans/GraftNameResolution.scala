package graft.plans

import graft.catalog.GraftCatalog
import graft.pipeline.ManifestTable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer rule resolving graft-addressed TABLE NAMES —
  * `spark.table("graft.db.t")`, `SELECT ... FROM graft.db.t`,
  * `FROM graft.t` — to the manifest-governed read plan.
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

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier.headOption
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
    }
}
