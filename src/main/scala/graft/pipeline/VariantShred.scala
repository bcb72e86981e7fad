package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** VARIANT SHREDDING — the storage half of the variant surface
  * (delta/iceberg's shredded-variant shape; the query half is
  * `variant_get`/`variant_explode` in `ops/Star`): declared typed
  * paths of a variant column MATERIALIZE as real columns at write
  * time, so that
  *
  *  1. reads of a shredded path never re-walk the variant encoding —
  *     they are ordinary typed column scans (column-pruned,
  *     codegen'd, dictionary-encoded like any other column);
  *  2. per-file min/max FOOTER stats exist for the path, so range
  *     predicates on it PRUNE FILES through the manifest's ordinary
  *     data-skipping machinery ([[ManifestTable.readNumericRange]]) —
  *     the "shredded-variant column stats" pruning delta's newest
  *     variant work ships. The variant column itself is a binary
  *     blob with no usable stats; without shredding every variant
  *     predicate is a full scan at any scale.
  *
  * The variant column stays stored IN FULL alongside its shreds
  * (Spark's parquet variant layout) — unshredded paths keep working
  * through `variant_get`, exactly the residual-access contract
  * shredded writers guarantee.
  *
  * SOUNDNESS (round 18): shreds are not an API convention anymore —
  * [[write]] declares each shred as a table GENERATED COLUMN
  * (`variant_get(v, '<path>', '<type>')`) in the SAME commit that
  * lands the data and the spec properties, so EVERY subsequent write
  * path — plain `ManifestTable.append`, `COPY INTO`, merge clauses,
  * predicate UPDATE, replaceWhere — recomputes an absent shred and
  * ENFORCES a present one row-for-row against the declaration
  * (a divergent hand-built shred fails the write job loudly; a wrong
  * shred can never land and ShredSubstitution can never serve it).
  * Each shred column additionally carries BINDING METADATA naming its
  * variant column and path, and the variant column carries the
  * writer's shredded marker — the identity [[graft.plans.ShredSubstitution]]
  * requires before substituting, so a user-minted `_shred_` column or
  * a re-derived variant never substitutes.
  *
  * Scale shape: shred computation is per-row at write time (one
  * `variant_get` per declared path — partition-local, no shuffle);
  * the optional range layout is the same one-exchange clustering step
  * any stats-friendly layout pays. Read-side pruning is driver
  * metadata only.
  */
object VariantShred {

  /** Manifest user-property key recording the shred spec
    * (`<path>:<type>` entries joined by `;`). */
  val ShredProp = "graft.variant.shredPaths"

  /** Manifest user-property key naming the shredded variant column. */
  val ShredColProp = "graft.variant.shredColumn"

  /** Column-metadata key on a shred column: the variant column it was
    * computed from. */
  val ShredOfKey = "graft.shred.of"

  /** Column-metadata key on a shred column: the declared json path. */
  val ShredPathKey = "graft.shred.path"

  /** Column-metadata key on the VARIANT column: the writer's marker
    * that this exact column (not a later re-derivation of it) is the
    * one the shreds were computed from; value = `;`-joined paths. */
  val MarkerKey = "graft.variant.shredded"

  /** The materialized column name for a shredded path:
    * `$.user.id` → `_shred_user_id` (alnum-safe, stable). */
  def shredName(jsonPath: String): String =
    "_shred_" + jsonPath.stripPrefix("$").stripPrefix(".")
      .map(c => if (c.isLetterOrDigit) c else '_')

  /** Shred types that join the persistent stats schema — parquet
    * footer min/max only index scalars ([[ManifestTable]] widens
    * long/double/string); complex/opaque shreds still materialize,
    * they just carry no skipping stats. */
  private def statsEligible(sqlType: String): Boolean = {
    val t = sqlType.toLowerCase.trim
    !t.contains("<") && !Set("variant", "binary", "boolean").contains(t)
  }

  private def validateSpec(paths: Seq[(String, String)]): Unit = {
    require(paths.nonEmpty, "variant shredding needs at least one path")
    paths.foreach { case (p, t) =>
      require(p.startsWith("$"), s"shred path '$p' must start at the root ($$)")
      require(!p.contains(";") && !p.contains(":"),
        s"shred path '$p' must not contain ';' or ':' (spec delimiters)")
      require(t.nonEmpty && !t.contains(";"),
        s"shred type '$t' must be non-empty and contain no ';'")
    }
    // name-encoding collisions ($.a.b and $.a_b both encode to
    // _shred_a_b) would silently serve one path's values for the
    // other — refuse loudly
    val collided = paths.map(pt => shredName(pt._1) -> pt._1)
      .groupBy(_._1).filter(_._2.size > 1)
    require(collided.isEmpty,
      "shred paths collide after name-encoding: " + collided.map {
        case (n, ps) => s"${ps.map(_._2).mkString(" and ")} -> $n"
      }.mkString("; ") + " — distinct paths must encode to distinct columns")
  }

  private def shredExprSql(vCol: String, path: String, t: String): String =
    s"variant_get(`$vCol`, '$path', '$t')"

  /** Write `df` with variant column `vCol` shredded on `paths`
    * ((jsonPath, sqlType) pairs, e.g. `("$.k", "long")`; array paths
    * shred as array columns, e.g. `("$.tags", "array<string>")`).
    * ONE atomic commit lands the data, the shred GENERATED-column
    * declarations (computed inside the same staging pass), the spec
    * properties, and the persistent stats schema — no
    * crash-between-commits window can leave shredded data without its
    * spec. `rangeLayoutOn` optionally range-partitions the write by
    * that path so per-file [min,max] are tight (the layout that makes
    * pruning bite — without it stats exist but every file spans the
    * domain). The batch must carry the RAW variant only (`_shred_`
    * columns are the writer's namespace). */
  def write(df: DataFrame, path: String, vCol: String,
            paths: Seq[(String, String)],
            rangeLayoutOn: Option[String] = None,
            rangePartitions: Int = 8,
            statsCols: Seq[String] = Nil): Long = {
    validateSpec(paths)
    require(df.columns.contains(vCol),
      s"batch has no variant column '$vCol'")
    // already-shredded check FIRST: a re-shred attempt reads the live
    // snapshot (which legitimately carries `_shred_` columns) — it
    // must refuse for the right reason, not the raw-batch contract
    val spark0 = df.sparkSession
    val props0 =
      if (ManifestTable.currentVersion(spark0, path).isEmpty)
        Map.empty[String, String]
      else ManifestTable.tableProperties(spark0, path)
    require(!props0.contains(ShredProp),
      s"table $path already has a shred spec " +
        s"(${props0.getOrElse(ShredProp, "")}) — shred declarations are " +
        "immutable once written (create a new table to re-shred)")
    require(!df.columns.exists(_.startsWith("_shred_")),
      "the batch must carry the RAW variant column only — `_shred_` is " +
        "the writer-reserved namespace; shreds compute from the declared " +
        "spec")
    val laidOut = rangeLayoutOn match {
      case Some(p) =>
        val t = paths.collectFirst { case (`p`, ty) => ty }.getOrElse(
          throw new IllegalArgumentException(
            s"rangeLayoutOn path '$p' is not among the declared shred paths"))
        df.repartitionByRange(rangePartitions, expr(shredExprSql(vCol, p, t)))
      case None => df
    }
    val spec = paths.map { case (p, t) => s"$p:$t" }.mkString(";")
    val gen = paths.map { case (p, t) =>
      shredName(p) -> shredExprSql(vCol, p, t) }.toMap
    // MERGE into any pre-existing properties / stats schema (the
    // commit's propertiesFull field replaces the whole map — an
    // overwrite of a live table must not wipe its other properties)
    val spark = df.sparkSession
    val prevProps = props0
    val prevStats = ManifestTable.currentVersion(spark, path)
      .map(v => ManifestTable.resolveState(spark, path, v).statsSchemaCols)
      .getOrElse(Nil)
    val statDecl = (prevStats ++ statsCols ++ paths.collect {
      case (p, t) if statsEligible(t) => shredName(p) }).distinct
    ManifestTable.write(laidOut, path,
      generatedAdds = gen,
      propertiesFull = Some(prevProps ++
        Map(ShredProp -> spec, ShredColProp -> vCol)),
      statsSchemaDecl = Some(statDecl))
  }

  /** Append a batch to an already-shredded table. The shreds are
    * GENERATED columns, so a plain [[ManifestTable.append]] computes
    * them too — this wrapper only adds the raw-batch contract check
    * and a loud error on unshredded tables. Refuses when the batch
    * already carries a `_shred_` column (hand-built shreds could
    * silently disagree with the spec — recompute is the only sound
    * path; a plain append carrying one is ENFORCED equal instead). */
  def append(df: DataFrame, path: String, vCol: String,
             tag: Option[String] = None): Long = {
    require(!df.columns.exists(_.startsWith("_shred_")),
      "the batch must carry the RAW variant column only — shred " +
        "columns recompute from the table's recorded spec")
    val props = ManifestTable.tableProperties(df.sparkSession, path)
    require(props.get(ShredProp).exists(_.nonEmpty),
      s"table $path has no recorded shred spec " +
        s"($ShredProp) — use VariantShred.write to create it")
    require(props.get(ShredColProp).contains(vCol),
      s"table $path shreds variant column " +
        s"'${props.getOrElse(ShredColProp, "?")}', got '$vCol'")
    ManifestTable.append(df, path, tag = tag)
  }

  /** The shred spec recorded at `path` (jsonPath → sqlType). */
  def shreddedPaths(spark: SparkSession, path: String): Map[String, String] =
    specOf(ManifestTable.tableProperties(spark, path)).toMap

  /** Split a legacy ','-delimited spec at TOP-LEVEL commas only —
    * a comma inside parens belongs to a type (`decimal(10,2)`), not
    * to the entry list. */
  private def splitTopLevelCommas(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.toSeq
  }

  private[graft] def specOf(props: Map[String, String]): Seq[(String, String)] =
    props.get(ShredProp) match {
      case Some(s) if s.nonEmpty =>
        // ';' is the recorded delimiter since the generated-column
        // rewrite; tables written by the earlier format recorded ','.
        // Bridge both on read (a ';'-free spec with commas can only
        // be the legacy form — the writer refuses delimiter chars in
        // paths, so ';' presence is authoritative), splitting legacy
        // commas OUTSIDE parens only so `decimal(10,2)` stays whole.
        val entries =
          if (s.contains(";") || !s.contains(",")) s.split(";").toSeq
          else splitTopLevelCommas(s)
        entries.map { e =>
          val Array(p, t) = e.split(":", 2); p -> t
        }
      case _ => Seq.empty
    }

  /** Re-tag a staging batch with the shred binding metadata on a
    * shred-spec'd table: each present shred column gets
    * (`ShredOfKey` → variant column, `ShredPathKey` → path) and the
    * variant column gets the writer's `MarkerKey` — the committed
    * schema then carries the identity ShredSubstitution requires.
    * Pure projection (no recompute); a no-op without a spec. Called
    * from the commit staging pass, AFTER the generated-column guard
    * computed any absent shreds. */
  private[pipeline] def retag(df: DataFrame,
                              props: Map[String, String]): DataFrame = {
    val spec = specOf(props)
    props.get(ShredColProp) match {
      case Some(vCol) if spec.nonEmpty && df.columns.contains(vCol) =>
        val present = spec.filter { case (p, _) =>
          df.columns.contains(shredName(p)) }
        if (present.isEmpty) df
        else {
          val marker = new MetadataBuilder()
            .putString(MarkerKey, present.map(_._1).mkString(";")).build()
          val byName = present.map { case (p, _) =>
            shredName(p) -> new MetadataBuilder()
              .putString(ShredOfKey, vCol)
              .putString(ShredPathKey, p).build()
          }.toMap
          df.select(df.columns.toSeq.map { c =>
            if (c == vCol) col(c).as(c, marker)
            else byName.get(c) match {
              case Some(m) => col(c).as(c, m)
              case None    => col(c)
            }
          }: _*)
        }
      case _ => df
    }
  }

  private def quoted(c: String): String = s"`$c`"

  /** Serve a typed variant path from `df`: the materialized shred
    * column when the writer declared it, a `variant_get` walk
    * otherwise — the transparent-access contract (callers never need
    * to know what was shredded). */
  def pathCol(df: DataFrame, vCol: String, jsonPath: String,
              sqlType: String): Column = {
    val n = shredName(jsonPath)
    if (df.columns.contains(n)) col(n)
    else expr(s"variant_get(${quoted(vCol)}, '$jsonPath', '$sqlType')")
  }

  /** Range read over a shredded path with FILE PRUNING: delegates to
    * the manifest's stats-based data skipping on the shred column —
    * files whose [min,max] miss [lo,hi] are never opened. The caller
    * still applies the row-level filter (pruning is file-granular). */
  def readPathRange(spark: SparkSession, path: String, jsonPath: String,
                    lo: Double, hi: Double): DataFrame =
    ManifestTable.readNumericRange(spark, path, shredName(jsonPath), lo, hi)

  /** (files a [lo,hi] range read touches, total files) — the pruning
    * diagnostic specs and declared queries assert on. */
  def pruneCount(spark: SparkSession, path: String, jsonPath: String,
                 lo: Double, hi: Double): (Int, Int) =
    ManifestTable.pruneCount(spark, path, shredName(jsonPath), lo, hi)
}
