package graft.plans

import graft.functions.{CosineSim, DdSketch, HyperplaneSig, MisraGries, NearestCentroid, ShingleHashes, SimHash64, ZOrderKey}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

/** Session-extension entry point: registers graft's native expressions
  * as SQL functions for every session built with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), making them usable from
  * pure SQL — `SELECT graft_cosine(a.v, b.v) FROM …` — not just the
  * Column API, and on every executor without per-session registration
  * calls.
  *
  * Round 11 adds the TABLE surface: [[GraftSqlParser]] (injectParser)
  * gives SQL spellings for the ACID verbs (MERGE / UPDATE / DELETE /
  * OPTIMIZE [ZORDER] / RESTORE / VACUUM / DESCRIBE HISTORY on
  * path-addressed tables), and two injected TABLE FUNCTIONS serve
  * reads incl. time travel from pure SQL:
  *
  *   SELECT * FROM graft_table('/path/t')           -- current version
  *   SELECT * FROM graft_table('/path/t', 3)        -- VERSION AS OF
  *   SELECT * FROM graft_table_at('/path/t', '2026-01-01 00:00:00')
  *
  * plus the sugar `graft.'/path/t' [VERSION AS OF n | TIMESTAMP AS OF
  * 'ts']` the parser rewrites into those calls. The TVFs expand at
  * ANALYSIS time into the manifest-governed read plan — the same
  * pruned, DV-filtered, column-mapped scan the Scala API produces, so
  * SQL reads inherit every optimization for free.
  *
  * No optimizer rules or strategies are injected beyond that: the
  * expressions declare determinism and foldability, so Catalyst's own
  * ConstantFolding / ColumnPruning / predicate pushdown already treat
  * them correctly (SURVEY §4 — "custom Catalyst work required: none").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** SQL fractional literals parse as DECIMAL (0.01 → DECIMAL(3,2)),
    * not DOUBLE — both spellings must reach the expression.
    */
  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Every builder coerces its inputs exactly like the Column facades
    // do (`.cast(...)` at analysis time). Without the casts the SQL
    // surface diverges from the Column surface on off-type arguments —
    // e.g. graft_zorder(BIGINT, BIGINT) threw ClassCastException
    // interpreted but silently truncated under codegen.
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(Cast(exprs.head, StringType))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSim(
        Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => ZOrderKey(
        Cast(exprs(0), IntegerType), Cast(exprs(1), IntegerType))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSig(
        Cast(exprs(0), ArrayType(DoubleType)),
        intLit(exprs(1), "numPlanes"), intLit(exprs(2), "planeOffset"))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(
        Cast(exprs(0), StringType), intLit(exprs(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_heavy_hitters"),
      (exprs: Seq[Expression]) => MisraGries(exprs(0),
        intLit(exprs(1), "k"), intLit(exprs(2), "capacity"))
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_dd_sketch"),
      new ExpressionInfo(classOf[DdSketch].getName, "graft_dd_sketch"),
      (exprs: Seq[Expression]) => DdSketch(Cast(exprs(0), DoubleType),
        doubleLit(exprs(1), "alpha"), intLit(exprs(2), "maxBins"))
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid"),
      (exprs: Seq[Expression]) => NearestCentroid(
        Cast(exprs(0), ArrayType(DoubleType)), intLit(exprs(1), "k"),
        NearestCentroid.flatLiteral(exprs(2)))))

    // --- table surface: SQL verbs + path-table reads (round 11) ---
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // --- catalog-name resolution (round 12): spark.table("graft.db.t")
    // and `FROM graft.db.t` resolve to the SAME manifest-governed scan
    // as the path API — see GraftNameResolution / GraftCatalog. The
    // catalog PLUGIN reserves the `graft` prefix (without it, Spark
    // misparses the identifier as a session-catalog namespace and
    // errors before any rule runs); auto-wired here so
    // `.withExtensions` alone is a complete setup ---
    ext.injectResolutionRule { session =>
      if (!session.conf.getOption("spark.sql.catalog.graft")
          .contains(classOf[graft.catalog.GraftCatalogPlugin].getName) &&
          session.conf.getOption("spark.sql.catalog.graft").isEmpty)
        session.conf.set("spark.sql.catalog.graft",
          classOf[graft.catalog.GraftCatalogPlugin].getName)
      GraftNameResolution(session)
    }
    // --- shred substitution (round 17): `variant_get(v,'$.p',t)` over
    // a shredded table silently reads the materialized `_shred_p`
    // column — standard variant SQL gets row-group + file pruning for
    // free (see ShredSubstitution's soundness contract) ---
    ext.injectResolutionRule(session => ShredSubstitution(session))
    ext.injectTableFunction((
      FunctionIdentifier("graft_table"),
      new ExpressionInfo(classOf[GraftSqlParser].getName, "graft_table"),
      (exprs: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val path = graft.catalog.GraftCatalog.resolvePathSpec(spark,
          strLit(exprs.head, "graft_table path"))
        val df =
          if (exprs.length >= 2)
            graft.pipeline.ManifestTable.readVersion(spark, path,
              longLit(exprs(1), "graft_table version"))
          else graft.pipeline.ManifestTable.read(spark, path)
        df.queryExecution.logical
      }))
    // CDF from SQL — Delta's table_changes TVF: one row per change in
    // [fromVersion, toVersion] with its commit version attached. Each
    // version's changes come from the O(touched-files) CDC unit; the
    // union aligns by name across schema evolution (missing columns
    // null, Delta CDF's convention).
    ext.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo(classOf[GraftSqlParser].getName, "graft_table_changes"),
      (exprs: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val path = graft.catalog.GraftCatalog.resolvePathSpec(spark,
          strLit(exprs.head, "graft_table_changes path"))
        val from = longLit(exprs(1), "graft_table_changes fromVersion")
        val to =
          if (exprs.length >= 3) longLit(exprs(2), "graft_table_changes toVersion")
          else graft.pipeline.ManifestTable.currentVersion(spark, path)
            .getOrElse(throw new IllegalStateException(
              s"no committed version at $path"))
        graft.pipeline.ManifestTable.changesBetween(spark, path, from, to)
          .queryExecution.logical
      }))
    ext.injectTableFunction((
      FunctionIdentifier("graft_table_at"),
      new ExpressionInfo(classOf[GraftSqlParser].getName, "graft_table_at"),
      (exprs: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val path = graft.catalog.GraftCatalog.resolvePathSpec(spark,
          strLit(exprs.head, "graft_table_at path"))
        val ms = exprs(1) match {
          case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other => GraftSqlCommands.parseTimestampMillis(
            strLit(other, "graft_table_at timestamp"))
        }
        graft.pipeline.ManifestTable.readAsOfTimestamp(spark, path, ms)
          .queryExecution.logical
      }))
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
