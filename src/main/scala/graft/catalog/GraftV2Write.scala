package graft.catalog

import graft.pipeline.ManifestTable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._

/** V2 write bridge for name-addressed tables — the
  * `DataFrameWriterV2` surface (`df.writeTo("graft.db.t").append()` /
  * `.overwrite(cond)` / `.create()`), the API shape delta-spark exposes
  * through its catalog (the reference's platform drives Delta via the
  * catalog-registered name, `/root/reference/src/etl_pipeline.py:36-37`).
  *
  * Deliberately a V1 FALLBACK write (`TableCapability.V1_BATCH_WRITE` →
  * Spark's `AppendDataExecV1` / `OverwriteByExpressionExecV1`): the
  * builder hands back the arriving DataFrame whole, so the write lands
  * through the SAME [[ManifestTable]] commit paths as every other
  * surface — OCC retry loop, identity/generated/NOT NULL guards,
  * stats sidecars, partition-layout contract — instead of a
  * hand-rolled per-partition `DataWriter` that would need a second
  * (less capable) commit protocol. Routing:
  *
  *   append()            → [[ManifestTable.append]] (O(new files)
  *                         transactional append; on a still-EMPTY table
  *                         the first batch lands as the initial write so
  *                         a declared `PARTITIONED BY` layout
  *                         materializes — V2 CTAS appends into the table
  *                         it just created)
  *   overwrite(lit(true))/truncate → [[ManifestTable.write]] (snapshot
  *                         replace; a declared layout is inherited)
  *   overwrite(cond)     → [[ManifestTable.overwriteWhere]] (Delta's
  *                         replaceWhere: only files the predicate
  *                         touches rewrite, the rest carry
  *                         byte-identical — the 100 TB-safe shape)
  *
  * `overwritePartitions()` (OVERWRITE_DYNAMIC) is not claimed:
  * dynamic-partition discovery of the replaced set is exactly what
  * `overwrite(cond)` expresses explicitly, without a silent
  * read-the-batch-twice cost.
  */
private[graft] class GraftWriteBuilder(table: GraftShellTable)
    extends WriteBuilder with SupportsOverwrite {

  /** None = plain append; Some(filters) = overwrite where the
    * conjunction holds (all-AlwaysTrue = truncate). */
  private var deleteFilters: Option[Array[Filter]] = None

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    deleteFilters = Some(filters)
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val spark = data.sparkSession
          require(table.pinnedVersion.isEmpty &&
              table.pinnedTimestampMs.isEmpty,
            s"cannot write to a time-travel view of ${table.tableName}")
          val path = table.path.getOrElse(
            GraftCatalog.tablePath(spark, table.tableName))
          deleteFilters match {
            case None =>
              // V2 CTAS creates the (possibly PARTITIONED BY) empty
              // table then appends the query result through this
              // builder: while a declared partition layout is still
              // UNMATERIALIZED and the table holds zero rows, the
              // batch lands as the first WRITE so `PARTITIONED BY`
              // takes effect (appends are unpartitioned by
              // ManifestTable contract). The row probe is limit(1)
              // over a just-declared table — cheap by construction,
              // and skipped entirely once any k=v dir exists.
              val declPending = ManifestTable.currentVersion(spark, path)
                .exists { v =>
                  val st = ManifestTable.resolveState(spark, path, v)
                  st.partitionColsDecl.nonEmpty &&
                    !st.files.exists(_.contains("="))
                }
              if (declPending &&
                  ManifestTable.read(spark, path).limit(1).isEmpty)
                ManifestTable.write(data, path): Unit
              else ManifestTable.append(data, path): Unit
            case Some(fs)
                if fs.isEmpty || fs.forall(_.isInstanceOf[AlwaysTrue]) =>
              ManifestTable.write(data, path): Unit
            case Some(fs) =>
              val cond = fs.map(GraftV2Write.filterToColumn)
                .reduce(_ && _)
              ManifestTable.overwriteWhere(data, path, cond): Unit
          }
        }
      }
  }
}

private[graft] object GraftV2Write {

  /** Render a V1 source `Filter` (what Spark translates
    * `overwrite(cond)`'s expression into) back to a `Column` for
    * [[ManifestTable.overwriteWhere]]. Untranslatable expressions never
    * reach here — Spark's own `V2Writes` analysis refuses them first.
    */
  def filterToColumn(f: Filter): Column = f match {
    case EqualTo(a, v)            => col(a) === lit(v)
    case EqualNullSafe(a, v)      => col(a) <=> lit(v)
    case GreaterThan(a, v)        => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v)           => col(a) < lit(v)
    case LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case In(a, vs)                => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a)                => col(a).isNull
    case IsNotNull(a)             => col(a).isNotNull
    case And(l, r)                => filterToColumn(l) && filterToColumn(r)
    case Or(l, r)                 => filterToColumn(l) || filterToColumn(r)
    case Not(c)                   => !filterToColumn(c)
    case StringStartsWith(a, v)   => col(a).startsWith(v)
    case StringEndsWith(a, v)     => col(a).endsWith(v)
    case StringContains(a, v)     => col(a).contains(v)
    case _: AlwaysTrue            => lit(true)
    case _: AlwaysFalse           => lit(false)
    case other => throw new IllegalArgumentException(
      s"overwrite condition filter not supported: $other")
  }
}
