package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * Scale shape: shred computation is per-row at write time (one
  * `variant_get` per declared path — partition-local, no shuffle);
  * the optional range layout is the same one-exchange clustering step
  * any stats-friendly layout pays. Read-side pruning is driver
  * metadata only.
  */
object VariantShred {

  /** Manifest user-property key recording the shred spec. */
  val ShredProp = "graft.variant.shredPaths"

  /** The materialized column name for a shredded path:
    * `$.user.id` → `_shred_user_id` (alnum-safe, stable). */
  def shredName(jsonPath: String): String =
    "_shred_" + jsonPath.stripPrefix("$").stripPrefix(".")
      .map(c => if (c.isLetterOrDigit) c else '_')

  /** Write `df` with variant column `vCol` shredded on `paths`
    * ((jsonPath, sqlType) pairs, e.g. `("$.k", "long")`). Each path
    * materializes via one `variant_get` and registers in the
    * manifest's stats columns; `rangeLayoutOn` optionally
    * range-partitions the write by that path's shred so per-file
    * [min,max] are tight (the layout that makes pruning bite —
    * without it stats exist but every file spans the domain). The
    * spec is recorded as a table property so readers can discover
    * shredded paths without convention-guessing. */
  def write(df: DataFrame, path: String, vCol: String,
            paths: Seq[(String, String)],
            rangeLayoutOn: Option[String] = None,
            rangePartitions: Int = 8,
            statsCols: Seq[String] = Nil): Long = {
    require(paths.nonEmpty, "variant shredding needs at least one path")
    val shredded = paths.foldLeft(df) { case (d, (p, t)) =>
      d.withColumn(shredName(p),
        expr(s"variant_get(${quoted(vCol)}, '$p', '$t')"))
    }
    val laidOut = rangeLayoutOn match {
      case Some(p) =>
        shredded.repartitionByRange(rangePartitions, col(shredName(p)))
      case None => shredded
    }
    val spec = paths.map { case (p, t) => s"$p:$t" }.mkString(",")
    ManifestTable.write(laidOut, path,
      statsCols = (statsCols ++ paths.map(pt => shredName(pt._1))).distinct)
    ManifestTable.setProperties(df.sparkSession, path,
      Map(ShredProp -> spec))
  }

  private def quoted(c: String): String = s"`$c`"

  /** Append a batch to an already-shredded table: the shred columns
    * recompute HERE from the recorded spec (the writer's contract —
    * callers hand over the raw variant batch and never maintain the
    * shreds by hand), then the ordinary append commits with the same
    * stats columns. Refuses when the batch already carries a
    * `_shred_` column (hand-built shreds could silently disagree
    * with the spec — recompute is the only sound path). */
  def append(df: DataFrame, path: String, vCol: String,
             tag: Option[String] = None): Long = {
    require(!df.columns.exists(_.startsWith("_shred_")),
      "the batch must carry the RAW variant column only — shred " +
        "columns recompute from the table's recorded spec")
    val spec = shreddedPaths(df.sparkSession, path)
    require(spec.nonEmpty, s"table $path has no recorded shred spec " +
      s"($ShredProp) — use VariantShred.write to create it")
    val shredded = spec.foldLeft(df) { case (d, (p, t)) =>
      d.withColumn(shredName(p),
        expr(s"variant_get(${quoted(vCol)}, '$p', '$t')"))
    }
    ManifestTable.append(shredded, path,
      statsCols = spec.keys.map(shredName).toSeq, tag = tag)
  }

  /** The shred spec recorded at `path` (jsonPath → sqlType). */
  def shreddedPaths(spark: SparkSession, path: String): Map[String, String] =
    ManifestTable.tableProperties(spark, path).get(ShredProp) match {
      case Some(s) if s.nonEmpty =>
        s.split(",").map { e =>
          val Array(p, t) = e.split(":", 2); p -> t
        }.toMap
      case _ => Map.empty
    }

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
