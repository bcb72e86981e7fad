package graft.sources

import graft.catalog.GraftCatalog
import graft.pipeline.ManifestTable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `format("graft")` — the named-format I/O surface, the reference's
  * LITERAL read/write API shape
  * (`/root/reference/src/etl_pipeline.py:66-69,77`:
  * `df.write.format("delta").partitionBy(...).mode("overwrite").save(p)`
  * / `spark.read.format("delta").load(p)`), mapped onto
  * [[ManifestTable]]:
  *
  *   df.write.format("graft")
  *     .mode("append" | "overwrite" | "errorifexists" | "ignore")
  *     .option("replaceWhere", "day = '2026-01-01'")   // overwrite only
  *     .option("txnTag", "job-42")                     // idempotent commit
  *     .partitionBy("year", "month")
  *     .save(pathOrName)                               // or graft:db.t
  *
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3)                       // time travel
  *     .option("timestampAsOf", "2026-01-01 00:00:00")
  *     .load(pathOrName)
  *
  *   spark.read.format("graft")                        // Delta's CDF
  *     .option("readChangeFeed", "true")               // read surface
  *     .option("startingVersion", 2)
  *     .option("endingVersion", 4)                     // default: current
  *     .load(pathOrName)                               // + _change, _commit_version
  *
  * One class registers every role of the name (META-INF services entry
  * ships with the jar, so the SHORT name works like `"delta"` does):
  * batch read, batch write, streaming sink
  * ([[graft.streaming.GraftSinkProvider]]'s exactly-once tagged
  * append), and streaming source ([[graft.streaming.TableFeedProvider]]
  * — `spark.readStream.format("graft").option("path", t)` subscribes
  * to the change feed).
  *
  * READ PATH — deliberately NOT a V1 row scan: [[GraftRelation]] is a
  * resolution-time placeholder that
  * [[graft.plans.GraftNameResolution]] replaces with the SAME
  * manifest-governed vectorized parquet plan the path API builds
  * (stats pruning, deletion vectors, column mapping, whole-stage
  * codegen — all inherited; no second read path). The V1 `buildScan`
  * exists only as a correctness fallback for sessions built WITHOUT
  * the graft extensions, where no analyzer rule can intervene.
  *
  * WRITE PATH scale shape is [[ManifestTable]]'s: append commits
  * O(new files) bytes; overwrite stages one new snapshot;
  * `replaceWhere` rewrites only the files the predicate touches and
  * carries the rest byte-identical; `txnTag` makes any mode a no-op
  * replay within the tag horizon (exactly-once restarts for batch
  * jobs, the Delta `txnAppId`/`txnVersion` idiom).
  */
class GraftFormat extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  // --- batch read -----------------------------------------------------

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = GraftFormat.pathOf(spark, parameters)
    require(ManifestTable.currentVersion(spark, path).isDefined,
      s"no committed graft table at $path")
    // Delta's CDF read surface: .option("readChangeFeed", "true") +
    // startingVersion|startingTimestamp [+ endingVersion|endingTimestamp].
    // Timestamps resolve against COMMIT wall-times in the log (driver
    // metadata): starting = first version at-or-after the instant,
    // ending = newest at-or-before it.
    val cdf = GraftFormat.opt(parameters, "readChangeFeed")
      .exists(_.toBoolean)
    val from =
      if (!cdf) None
      else GraftFormat.opt(parameters, "startingVersion").map(_.toLong)
        .orElse(GraftFormat.opt(parameters, "startingTimestamp").map { ts =>
          val ms = graft.plans.GraftSqlCommands.parseTimestampMillis(ts)
          ManifestTable.versions(spark, path)
            .find(v => ManifestTable.commitTimestamp(spark, path, v) >= ms)
            .getOrElse(throw new IllegalArgumentException(
              s"no commit at or after startingTimestamp '$ts' at $path"))
        })
    require(!cdf || from.isDefined,
      "readChangeFeed needs option(\"startingVersion\", n) or " +
        "option(\"startingTimestamp\", ts)")
    val to =
      if (!cdf) None
      else GraftFormat.opt(parameters, "endingVersion").map(_.toLong)
        .orElse(GraftFormat.opt(parameters, "endingTimestamp").map { ts =>
          val ms = graft.plans.GraftSqlCommands.parseTimestampMillis(ts)
          ManifestTable.versions(spark, path)
            .filter(v => ManifestTable.commitTimestamp(spark, path, v) <= ms)
            .lastOption.getOrElse(throw new IllegalArgumentException(
              s"no commit at or before endingTimestamp '$ts' at $path"))
        })
    GraftRelation(sqlContext, path,
      GraftFormat.opt(parameters, "versionAsOf").map(_.toLong),
      GraftFormat.opt(parameters, "timestampAsOf"),
      changeFeedFrom = from, changeFeedTo = to)
  }

  // --- batch write ----------------------------------------------------

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = data.sparkSession
    val path = GraftFormat.pathOf(spark, parameters)
    val tag = GraftFormat.opt(parameters, "txnTag")
    val partCols = parameters.get("__partition_columns")
      .map(GraftFormat.decodeStringArray).getOrElse(Nil)
    val replaceWhere = GraftFormat.opt(parameters, "replaceWhere")
    require(replaceWhere.isEmpty || mode == SaveMode.Overwrite,
      s"replaceWhere requires mode(\"overwrite\"), got $mode")
    // Delta's txnAppId/txnVersion writer-transaction options: a write
    // whose version is AT OR BELOW the app's last committed one is a
    // stale replay — skipped monotonically (stricter than txnTag's
    // exact-replay match; the options must arrive together)
    val txn: Option[(String, Long)] = {
      val app = GraftFormat.opt(parameters, "txnAppId")
      val ver = GraftFormat.opt(parameters, "txnVersion")
      require(app.isDefined == ver.isDefined,
        "txnAppId and txnVersion must be set together")
      app.map(a => (a, ver.get.toLong))
    }
    require(txn.isEmpty || replaceWhere.isEmpty,
      "txnAppId/txnVersion apply to write/append modes; replaceWhere " +
        "uses txnTag for exactly-once")
    def exists = ManifestTable.currentVersion(spark, path).isDefined
    // txnTag = exactly-once batch commits (the Delta txnAppId idiom):
    // a replayed job whose tag already committed is a SILENT no-op in
    // every mode, before any staging I/O happens
    val alreadyCommitted = tag.exists(t =>
      ManifestTable.committedVersionOfTag(spark, path, t).isDefined)
    if (!alreadyCommitted) mode match {
      case SaveMode.Append =>
        require(partCols.isEmpty,
          "append is unpartitioned by contract (a partitioned append would " +
            "mix layouts under one basePath) — partitionBy applies to " +
            "mode(\"overwrite\")")
        ManifestTable.append(data, path, tag = tag, txn = txn): Unit
      case SaveMode.Overwrite => replaceWhere match {
        case Some(cond) =>
          require(partCols.isEmpty,
            "replaceWhere keeps the table's existing layout; drop partitionBy")
          ManifestTable.overwriteWhere(data, path,
            org.apache.spark.sql.functions.expr(cond), tag = tag): Unit
        case None =>
          ManifestTable.write(data, path, partitionCols = partCols,
            tag = tag, txn = txn): Unit
      }
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table already exists at $path (SaveMode.ErrorIfExists)")
        ManifestTable.write(data, path, partitionCols = partCols,
          tag = tag, txn = txn): Unit
      case SaveMode.Ignore =>
        if (!exists)
          ManifestTable.write(data, path, partitionCols = partCols,
            tag = tag, txn = txn): Unit
    }
    GraftRelation(sqlContext, path, None, None)
  }

  // --- streaming: delegate to the dedicated providers -----------------

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink =
    new graft.streaming.GraftSinkProvider()
      .createSink(sqlContext, parameters, partitionColumns, outputMode)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    new graft.streaming.TableFeedProvider()
      .sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new graft.streaming.TableFeedProvider()
      .createSource(sqlContext, metadataPath, schema, providerName, parameters)
}

object GraftFormat {

  /** Option keys arrive case-LOWERED through the DataSource API when
    * spelled via `.option(...)`, but as-typed via the save/load path
    * argument — accept both spellings.
    */
  private[graft] def opt(parameters: Map[String, String],
                         key: String): Option[String] =
    parameters.get(key.toLowerCase).orElse(parameters.get(key))

  private[graft] def pathOf(spark: org.apache.spark.sql.SparkSession,
                            parameters: Map[String, String]): String =
    GraftCatalog.resolvePathSpec(spark, opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "format(\"graft\") needs a path: .load(p) / .save(p) / " +
          ".option(\"path\", p) — a storage path or graft:db.t")))

  /** `__partition_columns` is the JSON-array encoding DataFrameWriter
    * uses to hand `partitionBy(...)` to V1 providers. */
  private[graft] def decodeStringArray(json: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    require(node.isArray, s"expected a JSON string array, got $json")
    (0 until node.size()).map(node.get(_).asText())
  }
}

/** Resolution-time placeholder relation for `format("graft")` batch
  * reads. Under the graft extensions, [[graft.plans.GraftNameResolution]]
  * swaps the enclosing `LogicalRelation` for [[frame]]'s analyzed plan
  * — the manifest-governed vectorized scan — before any physical
  * planning, so this relation never executes. `buildScan` is the
  * extension-less fallback (plain sessions get correct rows through
  * the ordinary V1 row path).
  */
case class GraftRelation(sqlContext: SQLContext, path: String,
                         versionAsOf: Option[Long],
                         timestampAsOf: Option[String],
                         changeFeedFrom: Option[Long] = None,
                         changeFeedTo: Option[Long] = None)
    extends BaseRelation with TableScan {

  /** The manifest-governed read this relation stands for. */
  private[graft] def frame: DataFrame = {
    val spark = sqlContext.sparkSession
    changeFeedFrom match {
      case Some(from) =>
        ManifestTable.changesBetween(spark, path, from,
          changeFeedTo.getOrElse(
            ManifestTable.currentVersion(spark, path).getOrElse(
              throw new IllegalStateException(
                s"no committed version at $path"))))
      case None => (versionAsOf, timestampAsOf) match {
        case (Some(v), _) => ManifestTable.readVersion(spark, path, v)
        case (_, Some(ts)) => ManifestTable.readAsOfTimestamp(spark, path,
          graft.plans.GraftSqlCommands.parseTimestampMillis(ts))
        case _ => ManifestTable.read(spark, path)
      }
    }
  }

  override val schema: StructType = frame.schema

  override def buildScan(): RDD[Row] = frame.rdd

  override def toString: String = s"GraftRelation($path)"
}
