package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal commit-manifest table protocol — the observable core of the
  * reference's Delta ACID overwrite (`/root/reference/src/etl_pipeline.py:66-69`)
  * without Delta jars (none ship in this environment, SURVEY §1):
  *
  *  1. every write lands in a fresh `snap-<version>/` directory — data
  *     files of the previous version are never touched;
  *  2. the commit point is ONE atomic rename: a manifest listing the
  *     snapshot's data files is written to `_graft_manifest-v<N>.json.tmp`
  *     and renamed into place (rename is atomic on HDFS and local
  *     filesystems — the object-store caveat is the same one Delta's
  *     own log has);
  *  3. readers list the committed manifests, pick the highest version,
  *     and read exactly the files it names — a writer dying ANYWHERE
  *     before the rename leaves only an orphaned snapshot directory
  *     that no reader ever sees.
  *
  * Old versions stay readable ([[readVersion]] — time travel) until
  * [[vacuum]] drops them. A write may additionally record per-file
  * column min/max/null-count statistics in the manifest (`statsCols`,
  * read metadata-only from the parquet footers) which
  * [[readNumericRange]] uses for Delta-style data skipping: predicate
  * reads on a clustered table touch only the files whose stats
  * intervals intersect the query range. Concurrent writers are handled by OPTIMISTIC
  * CONCURRENCY: the manifest rename is the conditional commit (rename
  * onto an existing destination fails on HDFS/local filesystems), so a
  * writer that loses the race re-stages its snapshot under the next
  * version and retries — the Delta-style OCC loop without a log store.
  */
object ManifestTable {

  private val ManifestPrefix = "_graft_manifest-v"

  /** Default replay-protection horizon: each manifest carries at most
    * this many (newest-by-version) tags forward. A batch replayed after
    * more than this many subsequent tagged commits re-appends —
    * retention must exceed the maximum replay horizon, exactly the
    * contract Delta's txn-retention duration draws. Per-call (a
    * parameter of write/append/appendIdempotent, not mutable static
    * state): concurrent writers in one JVM each get the horizon they
    * asked for — a test shrinking it can never truncate the tag map of
    * a production table racing it.
    */
  val DefaultTagHorizon: Int = 100000

  /** Per-file column statistics carried by the manifest (the Delta-style
    * data-skipping index). `complete` is false when any row group of the
    * file lacked statistics for the column — such files are never pruned.
    * Numeric stats are widened to double for comparison; `typ` is one of
    * "long", "double", "string".
    */
  final case class ColStats(typ: String, min: Any, max: Any,
                            nulls: Long, complete: Boolean)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions present at `path`, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && n.endsWith(".json"))
      .map(n => n.stripPrefix(ManifestPrefix).stripSuffix(".json").toLong)
      .sorted.toSeq
  }

  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    versions(spark, path).lastOption

  /** Write `df` as the table's next version and commit it. Returns the
    * committed version number. The snapshot directory is written first
    * (overwriting any orphan left by a previous failed attempt at the
    * same version); the manifest rename is the last — and only
    * observable — step, and it is CONDITIONAL: rename onto an existing
    * destination fails, so losing a commit race to a concurrent writer
    * is detected, the orphaned attempt is dropped, and the write
    * re-stages under the next version (optimistic concurrency,
    * bounded by `maxAttempts`).
    */
  def write(df: DataFrame, path: String,
            partitionCols: Seq[String] = Nil, maxAttempts: Int = 3,
            statsCols: Seq[String] = Nil, tag: Option[String] = None,
            tagHorizon: Int = DefaultTagHorizon): Long =
    commit(df, path, partitionCols, maxAttempts, statsCols,
      carryForward = false, tag = tag, tagHorizon = tagHorizon)

  /** Transactional APPEND: commit a new version whose file list is the
    * current version's files PLUS this batch's — Delta-style `append`
    * without Delta. The data files of previous versions are never
    * touched or rewritten; an appender dying mid-stage is invisible.
    * An optional `tag` (e.g. a streaming batch id) is recorded in the
    * manifest for [[appendIdempotent]].
    */
  def append(df: DataFrame, path: String,
             partitionCols: Seq[String] = Nil, maxAttempts: Int = 3,
             statsCols: Seq[String] = Nil, tag: Option[String] = None,
             tagHorizon: Int = DefaultTagHorizon): Long =
    commit(df, path, partitionCols, maxAttempts, statsCols,
      carryForward = true, tag = tag, tagHorizon = tagHorizon)

  /** Idempotent tagged append for exactly-once sinks: if the table has
    * ever committed `tag`, the call is a no-op returning that version —
    * a redelivered micro-batch (checkpoint loss, restarted query,
    * at-least-once upstream) commits nothing twice. Idempotence is per
    * serialized writer (a Structured Streaming query runs its batches
    * serially); two CONCURRENT writers racing the same fresh tag are
    * the one case this cannot collapse — the same boundary Delta's txn
    * appId/version protocol draws.
    *
    * Replay protection SURVIVES [[vacuum]]: every commit carries the
    * tag→version map forward into its manifest (the way Delta retains
    * txn versions in checkpoints), so dropping old manifests never
    * forgets a live tag — a batch replayed after its own manifest was
    * vacuumed still no-ops. The map is BOUNDED at `tagHorizon` newest
    * tags (the replay horizon, default [[DefaultTagHorizon]]); a replay
    * arriving later than that re-appends.
    */
  def appendIdempotent(df: DataFrame, path: String, tag: String,
                       partitionCols: Seq[String] = Nil,
                       statsCols: Seq[String] = Nil,
                       maxAttempts: Int = 3,
                       tagHorizon: Int = DefaultTagHorizon): Long =
    committedVersionOfTag(df.sparkSession, path, tag).getOrElse(
      append(df, path, partitionCols, maxAttempts = maxAttempts,
        statsCols = statsCols, tag = Some(tag), tagHorizon = tagHorizon))

  /** The committed version carrying `tag`, if any. One manifest read:
    * the CURRENT manifest's carried tag map answers membership for the
    * whole history (pre-tag-map legacy manifests fall back to a
    * newest-first per-manifest scan of the own-tag field).
    */
  def committedVersionOfTag(spark: SparkSession, path: String,
                            tag: String): Option[Long] =
    currentVersion(spark, path).flatMap { cur =>
      val node = manifestNode(spark, path, cur)
      if (node.has("tags")) Option(node.get("tags").get(tag)).map(_.asLong())
      else versions(spark, path).reverseIterator.find { v =>
        val t = manifestNode(spark, path, v).get("tag")
        t != null && t.asText() == tag
      }
    }

  /** Full tag→version map as of `version` (carried map when present;
    * reconstructed from per-manifest own tags on legacy tables).
    */
  private def manifestTags(spark: SparkSession, path: String,
                           version: Long): Map[String, Long] = {
    val node = manifestNode(spark, path, version)
    if (node.has("tags")) {
      val t = node.get("tags")
      val out = scala.collection.mutable.Map.empty[String, Long]
      val it = t.fieldNames()
      while (it.hasNext) { val k = it.next(); out += k -> t.get(k).asLong() }
      out.toMap
    } else
      versions(spark, path).filter(_ <= version).flatMap { v =>
        val t = manifestNode(spark, path, v).get("tag")
        if (t == null) None else Some(t.asText() -> v)
      }.toMap
  }

  private def commit(df: DataFrame, path: String, partitionCols: Seq[String],
                     maxAttempts: Int, statsCols: Seq[String],
                     carryForward: Boolean, tag: Option[String],
                     tagHorizon: Int = DefaultTagHorizon): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    require(!carryForward || partitionCols.isEmpty,
      "append is unpartitioned by contract: a partitioned append would mix " +
        "k=v and flat snapshot layouts under one basePath, which Spark's " +
        "partition discovery rejects at read time")
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = currentVersion(spark, path)
      val version = prev.getOrElse(0L) + 1L
      // fail-fast twin of the require above: appending onto a base
      // version whose files live in k=v partition dirs would commit an
      // unreadable mixed layout
      if (carryForward) prev.foreach { pv =>
        require(!manifestFiles(spark, path, pv)
            .exists(_.split("/").exists(_.contains("="))),
          s"cannot append onto partitioned version $pv of $path — " +
            "rewrite it unpartitioned first (compact) or overwrite")
      }
      // schema rides in the manifest (Delta keeps it in the log): an
      // overwrite commits the batch's schema; an append commits the
      // EVOLVED union — previous columns first, new columns appended —
      // so readers of the new version see old files' missing columns as
      // nulls instead of whichever file's footer the reader sampled.
      // Computed BEFORE staging: an incompatible append (type change)
      // fails fast, leaving no orphan files.
      val schema =
        if (carryForward)
          prev.flatMap(manifestSchema(spark, path, _))
            .map(evolve(_, df.schema)).getOrElse(df.schema)
        else df.schema
      // WRITER-UNIQUE staging dir: two writers racing for version N
      // must never stage into the same directory (an overwrite write
      // would clobber the other's files before its commit). The
      // committed manifest carries the full unique paths, so readers
      // never care which writer's directory won.
      val token = java.util.UUID.randomUUID.toString.take(8)
      val snapDir = s"$path/snap-$version-$token"
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(snapDir)
      var staged = listDataFiles(f, new Path(snapDir))
      if (staged.isEmpty && !(carryForward && prev.nonEmpty)) {
        // a PARTITIONED write of zero rows emits no files at all, which
        // would commit an unreadable version — re-stage unpartitioned:
        // an empty non-partitioned parquet write keeps a schema-bearing
        // file (partition columns become ordinary empty columns). An
        // append onto existing history skips this: the carried files
        // already make the version readable.
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(snapDir)
        staged = listDataFiles(f, new Path(snapDir))
      }
      val carried: Seq[String] =
        if (carryForward) prev.map(manifestFiles(spark, path, _)).getOrElse(Nil)
        else Nil
      // carried stats survive UNCONDITIONALLY: an append made without
      // statsCols (e.g. a streaming batch) must not silently strip the
      // data-skipping index off the whole history — only its own new
      // files go unindexed (and are conservatively never pruned)
      val carriedStats: Map[String, Map[String, ColStats]] =
        if (carryForward)
          prev.map(manifestStats(spark, path, _)).getOrElse(Map.empty)
        else Map.empty
      val files = carried ++ staged.map(p => relativize(new Path(path), p))
      val manifest = new Path(path, s"$ManifestPrefix$version.json")
      val tmp = new Path(path, s"$ManifestPrefix$version.json.$token.tmp")
      val newStats: Map[String, Map[String, ColStats]] =
        if (statsCols.isEmpty) Map.empty
        else staged.map(p => relativize(new Path(path), p) ->
          footerStats(spark, p, statsCols)).toMap
      // the tag→version map rides every manifest (overwrites too — a
      // replayed batch must no-op even after the data it wrote was
      // replaced), so vacuum dropping old manifests never erases replay
      // protection and tag membership is one manifest read. BOUNDED:
      // only the newest tagHorizon survive (evicted by commit
      // version — the replay horizon, same boundary Delta draws with
      // txn retention); unbounded carry would grow every manifest and
      // every commit by O(total batches ever) on a long-lived sink.
      val allTags: Map[String, Long] =
        (prev.map(manifestTags(spark, path, _)).getOrElse(Map.empty) ++
          tag.map(_ -> version))
          .toSeq.sortBy { case (t, v) => (-v, t) }
          .take(tagHorizon).toMap
      val json = manifestJson(spark, version, files,
        carriedStats ++ newStats, tag, Some(schema), allTags)
      val out = f.create(tmp, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
      // conditional commit: must atomically fail if a concurrent
      // writer already committed version N (see conditionalCommit)
      if (conditionalCommit(f, tmp, manifest)) return version
      // lost the race — drop this attempt's staging, re-stage on next N
      f.delete(tmp, false)
      f.delete(new Path(snapDir), true)
      attempt += 1
    }
    throw new IllegalStateException(
      s"manifest commit lost $maxAttempts races at $path — giving up")
  }

  /** Read the table's current committed version. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path,
      currentVersion(spark, path).getOrElse(
        throw new IllegalStateException(s"no committed version at $path")))

  /** Time travel: read an explicit committed version. `basePath` (the
    * snapshot directory, taken from the manifest's own file list) keeps
    * partition columns derived from `k=v` directory names inside the
    * snapshot.
    */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val rel = manifestFiles(spark, path, version)
    require(rel.nonEmpty, s"version $version at $path has no data files")
    readFiles(spark, path, version, rel)
  }

  /** Shared file-list reader: basePath spans every named snapshot dir
    * (single-snapshot overwrite versions keep the snapshot root so k=v
    * partition dirs are discovered; appended versions span several dirs
    * and are unpartitioned by contract), and the manifest's recorded
    * schema governs the read — files predating an additive evolution
    * surface their missing columns as nulls instead of whichever file's
    * footer the reader samples. EVERY read path (full, time travel,
    * stats-pruned) must come through here or drift on appended tables.
    */
  private def readFiles(spark: SparkSession, path: String, version: Long,
                        rel: Seq[String]): DataFrame = {
    val files = rel.map(r => s"$path/$r")
    val roots = rel.map(_.split("/").head).distinct
    val base = if (roots.length == 1) s"$path/${roots.head}" else path
    val reader = spark.read.option("basePath", base)
    manifestSchema(spark, path, version) match {
      case Some(s) => reader.schema(s).parquet(files: _*)
      case None    => reader.parquet(files: _*)
    }
  }

  /** The data files a committed manifest names (table-relative). */
  def manifestFiles(spark: SparkSession, path: String, version: Long): Seq[String] = {
    val node = manifestNode(spark, path, version)
    val arr = node.get("files")
    (0 until arr.size()).map(arr.get(_).asText())
  }

  /** Per-file column statistics recorded by a committed manifest
    * (empty map when the version was written without `statsCols`).
    */
  def manifestStats(spark: SparkSession, path: String,
                    version: Long): Map[String, Map[String, ColStats]] = {
    val node = manifestNode(spark, path, version)
    val stats = node.get("stats")
    if (stats == null) Map.empty
    else {
      val out = scala.collection.mutable.Map.empty[String, Map[String, ColStats]]
      val fileIt = stats.fieldNames()
      while (fileIt.hasNext) {
        val file = fileIt.next()
        val cols = stats.get(file)
        val perCol = scala.collection.mutable.Map.empty[String, ColStats]
        val colIt = cols.fieldNames()
        while (colIt.hasNext) {
          val c = colIt.next()
          val n = cols.get(c)
          val typ = n.get("type").asText()
          def v(field: String): Any = typ match {
            case "long"   => n.get(field).asLong()
            case "double" => n.get(field).asDouble()
            case _        => n.get(field).asText()
          }
          perCol += c -> ColStats(typ, v("min"), v("max"),
            n.get("nulls").asLong(), n.get("complete").asBoolean())
        }
        out += file -> perCol.toMap
      }
      out.toMap
    }
  }

  /** Data-skipping read: the current version restricted to files whose
    * recorded [min, max] for `column` intersects [lower, upper] — the
    * observable half of Delta's stats-based file pruning. Files without
    * complete stats for the column are kept (pruning must be sound, not
    * complete). The caller still applies its own row-level filter; this
    * only shrinks the file list the scan touches — on a Z-ordered or
    * range-clustered table that is the 100 TB "read 4 files, not 4000"
    * win.
    */
  def readNumericRange(spark: SparkSession, path: String, column: String,
                       lower: Double, upper: Double): DataFrame = {
    val version = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    val all = manifestFiles(spark, path, version)
    val stats = manifestStats(spark, path, version)
    val keep = all.filter { file =>
      stats.get(file).flatMap(_.get(column)) match {
        case Some(s) if s.complete && s.typ != "string" =>
          val mn = s.min.toString.toDouble
          val mx = s.max.toString.toDouble
          mx >= lower && mn <= upper
        case _ => true // no/partial stats → cannot prune soundly
      }
    }
    require(all.nonEmpty, s"version $version at $path has no data files")
    if (keep.isEmpty) read(spark, path).limit(0)
    else readFiles(spark, path, version, keep)
  }

  /** How many files [[readNumericRange]] would touch vs the total —
    * the pruning diagnostic the spec asserts on.
    */
  def pruneCount(spark: SparkSession, path: String, column: String,
                 lower: Double, upper: Double): (Int, Int) = {
    val version = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    val all = manifestFiles(spark, path, version)
    val stats = manifestStats(spark, path, version)
    val kept = all.count { file =>
      stats.get(file).flatMap(_.get(column)) match {
        case Some(s) if s.complete && s.typ != "string" =>
          s.max.toString.toDouble >= lower && s.min.toString.toDouble <= upper
        case _ => true
      }
    }
    (kept, all.size)
  }

  private def manifestNode(spark: SparkSession, path: String,
                           version: Long): com.fasterxml.jackson.databind.JsonNode = {
    val f = fs(spark, path)
    val manifest = new Path(path, s"$ManifestPrefix$version.json")
    val in = f.open(manifest)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(node.get("version").asLong() == version,
      s"manifest $manifest names version ${node.get("version")} — corrupt table")
    node
  }

  /** Per-file min/max/null-count for `statsCols`, read from the parquet
    * FOOTER row-group metadata — metadata-only, no data pages touched
    * (what Delta collects during the write itself; reading footers of
    * just-written files is the library-level equivalent, O(row groups)
    * regardless of data size). Columns with unsupported physical types
    * (int96, fixed binary) or with any stats-less row group are marked
    * incomplete and never prune.
    */
  private def footerStats(spark: SparkSession, file: Path,
                          statsCols: Seq[String]): Map[String, ColStats] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import scala.jdk.CollectionConverters._
    val want = statsCols.toSet
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(file, spark.sparkContext.hadoopConfiguration))
    try {
      val acc = scala.collection.mutable.Map.empty[String, ColStats]
      for (block <- reader.getFooter.getBlocks.asScala;
           col <- block.getColumns.asScala) {
        val name = col.getPath.toDotString
        if (want.contains(name)) {
          val st = col.getStatistics
          val prev = acc.get(name)
          def widen(v: Any): Option[(String, Any)] = v match {
            case l: java.lang.Long    => Some(("long", l.longValue()))
            case i: java.lang.Integer => Some(("long", i.longValue()))
            case d: java.lang.Double  => Some(("double", d.doubleValue()))
            case fl: java.lang.Float  => Some(("double", fl.doubleValue()))
            case b: Binary            => Some(("string", b.toStringUsingUTF8))
            case _                    => None
          }
          val rg: Option[ColStats] =
            if (st == null || !st.hasNonNullValue) None
            else for {
              (t1, mn) <- widen(st.genericGetMin)
              (_, mx)  <- widen(st.genericGetMax)
            } yield ColStats(t1, mn, mx, st.getNumNulls, complete = true)
          val merged = (prev, rg) match {
            case (None, Some(s)) => s
            case (Some(p), Some(s)) if p.complete && p.typ == s.typ =>
              ColStats(p.typ, minOf(p.typ, p.min, s.min),
                maxOf(p.typ, p.max, s.max), p.nulls + s.nulls, complete = true)
            case (Some(p), _) => p.copy(complete = false)
            case (None, None) =>
              ColStats("long", 0L, 0L, 0L, complete = false)
          }
          acc += name -> merged
        }
      }
      acc.toMap
    } finally reader.close()
  }

  private def minOf(typ: String, a: Any, b: Any): Any = typ match {
    case "long"   => math.min(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "double" => math.min(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _        => if (a.asInstanceOf[String] <= b.asInstanceOf[String]) a else b
  }

  private def maxOf(typ: String, a: Any, b: Any): Any = typ match {
    case "long"   => math.max(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "double" => math.max(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _        => if (a.asInstanceOf[String] >= b.asInstanceOf[String]) a else b
  }

  /** Additive schema evolution: previous columns keep their position
    * and type; columns new in `incoming` append at the end. A shared
    * name with a DIFFERENT type is rejected — silent coercion is how
    * tables corrupt.
    */
  private[pipeline] def evolve(prev: org.apache.spark.sql.types.StructType,
                               incoming: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val prevNames = prev.fieldNames.toSet
    incoming.fields.filter(f => prevNames.contains(f.name)).foreach { f =>
      val p = prev(f.name)
      require(p.dataType == f.dataType,
        s"append changes type of '${f.name}': ${p.dataType} -> ${f.dataType}")
    }
    org.apache.spark.sql.types.StructType(
      prev.fields ++ incoming.fields.filterNot(f => prevNames.contains(f.name)))
  }

  /** The schema a committed manifest records (absent on pre-schema
    * manifests → readers fall back to footer inference). */
  def manifestSchema(spark: SparkSession, path: String,
                     version: Long): Option[org.apache.spark.sql.types.StructType] = {
    val n = manifestNode(spark, path, version).get("schema")
    Option(n).map(s => org.apache.spark.sql.types.DataType.fromJson(s.asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  private def manifestJson(spark: SparkSession, version: Long,
                           files: Seq[String],
                           stats: Map[String, Map[String, ColStats]],
                           tag: Option[String] = None,
                           schema: Option[org.apache.spark.sql.types.StructType] = None,
                           tags: Map[String, Long] = Map.empty): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", version)
    tag.foreach(root.put("tag", _))
    // always present (possibly empty) so tag lookups on any post-legacy
    // manifest are a single read, never a history scan
    val tagsNode = root.putObject("tags")
    tags.toSeq.sortBy(_._1).foreach { case (k, v) => tagsNode.put(k, v) }
    schema.foreach(s => root.put("schema", s.json))
    val arr = root.putArray("files")
    files.foreach(arr.add)
    if (stats.nonEmpty) {
      val statsNode = root.putObject("stats")
      for ((file, cols) <- stats.toSeq.sortBy(_._1)) {
        val fileNode = statsNode.putObject(file)
        for ((c, s) <- cols.toSeq.sortBy(_._1)) {
          val n = fileNode.putObject(c)
          n.put("type", s.typ)
          s.typ match {
            case "long" =>
              n.put("min", s.min.asInstanceOf[Long])
              n.put("max", s.max.asInstanceOf[Long])
            case "double" =>
              n.put("min", s.min.asInstanceOf[Double])
              n.put("max", s.max.asInstanceOf[Double])
            case _ =>
              n.put("min", s.min.toString)
              n.put("max", s.max.toString)
          }
          n.put("nulls", s.nulls)
          n.put("complete", s.complete)
        }
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Row-level keyed MERGE (copy-on-write upsert/delete) — the
    * delta-spark flagship write op (`MERGE INTO`, the operation the
    * reference wires Delta for: `/root/reference/src/etl_pipeline.py:36-41`)
    * re-expressed over the manifest protocol. Semantics per key:
    * an `updates` row whose key matches a base row REPLACES it; a
    * non-matching row INSERTS; a row flagged true in `deleteCol`
    * DELETES its key (no insert). The merged table is the next
    * committed version; failure anywhere before the manifest rename is
    * invisible.
    *
    * Copy-on-write file selection — the part that decides whether this
    * works at 100 TB:
    *
    *  1. STATS PRUNE (metadata-only, driver): files whose recorded
    *     [min,max] for `key` cannot intersect the updates' key range
    *     are untouched by construction — on a key-clustered table
    *     (write with `statsCols = Seq(key)` after range-partitioning;
    *     or [[compact]] with `sortCols`) a 0.1%-of-keys merge prunes
    *     almost every file without reading a byte of data.
    *  2. SEMI-JOIN CONFIRM (one distributed job over the SURVIVORS
    *     only): scan the candidate files with `input_file_name`,
    *     broadcast-semi-join the update keys, collect the distinct
    *     file names that actually contain a matching key. O(candidate
    *     bytes), never O(table).
    *  3. REWRITE touched files only: surviving rows (anti-join on key)
    *     plus ALL upsert rows stage into a fresh snapshot dir; the new
    *     manifest lists untouched files VERBATIM (same paths — the
    *     spec asserts they are physically the same bytes) plus the
    *     staged rewrites. Untouched files keep their carried stats;
    *     staged files are re-indexed when `statsCols` is passed.
    *
    * A matched key living in an untouched file is impossible — step 2
    * touches every file containing any update key — so "insert = key
    * matched nowhere" needs no global key scan. The update side is
    * broadcast (merges are small-vs-big by nature; a merge whose
    * update side rivals the table should be an overwrite).
    *
    * Schema contract: `updates` must carry exactly the table's columns
    * (plus `deleteCol`) with identical types — merge never evolves
    * schema (that is [[append]]'s contract). Unpartitioned tables only,
    * same as append, and the same OCC retry loop as every commit. An
    * optional `tag` makes the merge replay-idempotent ([[appendIdempotent]]
    * semantics: a redelivered merge with a committed tag no-ops).
    * NULL keys follow SQL join semantics end to end: a null-keyed
    * update row matches nothing (it inserts), and null-keyed base rows
    * are never touched or deleted. Duplicate keys in `updates` write
    * ALL their rows (the matched base row is dropped once) — callers
    * needing Delta's multiple-match error use [[mergeConditional]],
    * which enforces key-uniqueness (clause arbitration demands it).
    */
  def merge(updates: DataFrame, path: String, key: String,
            deleteCol: Option[String] = None,
            statsCols: Seq[String] = Nil, maxAttempts: Int = 3,
            tag: Option[String] = None,
            tagHorizon: Int = DefaultTagHorizon,
            sortCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, input_file_name, lit, max => smax, min => smin}
    val spark = updates.sparkSession
    val alreadyCommitted = tag.flatMap(committedVersionOfTag(spark, path, _))
    if (alreadyCommitted.isDefined) return alreadyCommitted.get
    val f = fs(spark, path)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prevV = currentVersion(spark, path).getOrElse(
        throw new IllegalStateException(s"no committed version at $path to merge into"))
      val version = prevV + 1L
      val all = manifestFiles(spark, path, prevV)
      require(!all.exists(_.split("/").exists(_.contains("="))),
        s"cannot merge into partitioned version $prevV of $path — " +
          "rewrite it unpartitioned first (compact) or overwrite")
      val schema = manifestSchema(spark, path, prevV).getOrElse(
        readVersion(spark, path, prevV).schema)
      // schema contract: exactly the table's columns (+ deleteCol)
      val updCols = updates.schema.fields
        .filterNot(fd => deleteCol.contains(fd.name))
      require(updCols.map(fd => fd.name -> fd.dataType).sortBy(_._1).toSeq ==
          schema.fields.map(fd => fd.name -> fd.dataType).sortBy(_._1).toSeq,
        s"merge updates schema ${updCols.map(_.name).mkString("(", ",", ")")} " +
          s"must carry exactly the table columns ${schema.fieldNames.mkString("(", ",", ")")}")
      val stats = manifestStats(spark, path, prevV)
      // 1) stats prune against the updates' key range (one tiny agg).
      // Only NUMERIC keys prune on stats (string min/max ordering is
      // collation-dependent); non-numeric keys fall through to the
      // semi-join confirm with every file as candidate — still
      // O(table) at worst, never wrong.
      val numericKey = schema(key).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      val bounds = updates.agg(smin(col(key)), smax(col(key))).head()
      val candidates: Seq[String] =
        if (bounds.isNullAt(0)) Nil // no update keys → nothing touched
        else if (!numericKey) all
        else {
          val kLo = bounds.get(0).toString.toDouble
          val kHi = bounds.get(1).toString.toDouble
          all.filter { file =>
            stats.get(file).flatMap(_.get(key)) match {
              case Some(s) if s.complete && s.typ != "string" =>
                s.max.toString.toDouble >= kLo && s.min.toString.toDouble <= kHi
              case _ => true // no/partial stats → must be confirmed
            }
          }
        }
      // 2) semi-join confirm over candidate files only
      val updKeys = updates.select(col(key)).distinct()
      val touched: Seq[String] =
        if (candidates.isEmpty) Nil
        else {
          val hit = readFiles(spark, path, prevV, candidates)
            .select(input_file_name().as("_graft_file"), col(key))
            .join(broadcast(updKeys), Seq(key), "left_semi")
            .select(col("_graft_file")).distinct()
            .collect().map(_.getString(0)) // bounded by candidate file count
          // input_file_name yields absolute URIs; map back by suffix
          candidates.filter(rel => hit.exists(_.endsWith(rel)))
        }
      val untouched = all.filterNot(touched.contains)
      // 3) rewrite only the touched rows
      val upserts = deleteCol match {
        case Some(dc) => updates.filter(!coalesce(col(dc), lit(false))).drop(dc)
        case None     => updates
      }
      val ordered = upserts.select(schema.fieldNames.map(col).toSeq: _*)
      val newData =
        if (touched.isEmpty) ordered
        else readFiles(spark, path, prevV, touched)
          .join(broadcast(updKeys), Seq(key), "left_anti")
          .select(schema.fieldNames.map(col).toSeq: _*)
          .unionByName(ordered)
      val token = java.util.UUID.randomUUID.toString.take(8)
      val snapDir = s"$path/snap-$version-$token"
      // stage in ~as many files as were touched (shuffle-free coalesce):
      // a merge must not fragment the rewrite into shuffle.partitions
      // slivers — file count stays stable across repeated merges.
      // `sortCols` re-sorts the rewritten files in place (no extra
      // shuffle), so a clustered table keeps tight per-file stats
      // through update churn instead of degrading until the next
      // compact(sortCols) — pass the table's cluster key here.
      val packed = newData.coalesce(math.max(1, touched.size))
      (if (sortCols.nonEmpty)
         packed.sortWithinPartitions(
           sortCols.map(org.apache.spark.sql.functions.col): _*)
       else packed)
        .write.mode("overwrite").parquet(snapDir)
      var staged = listDataFiles(f, new Path(snapDir))
      if (staged.isEmpty && untouched.isEmpty) {
        // all rows deleted: commit a readable empty version
        newData.limit(0).coalesce(1).write.mode("overwrite").parquet(snapDir)
        staged = listDataFiles(f, new Path(snapDir))
      }
      val stagedRel = staged.map(p => relativize(new Path(path), p))
      val newStats: Map[String, Map[String, ColStats]] =
        if (statsCols.isEmpty) Map.empty
        else staged.map(p => relativize(new Path(path), p) ->
          footerStats(spark, p, statsCols)).toMap
      val carriedStats = stats.view.filterKeys(untouched.contains).toMap
      val allTags: Map[String, Long] =
        (manifestTags(spark, path, prevV) ++ tag.map(_ -> version))
          .toSeq.sortBy { case (t, v) => (-v, t) }
          .take(tagHorizon).toMap
      val json = manifestJson(spark, version, untouched ++ stagedRel,
        carriedStats ++ newStats, tag, Some(schema), allTags)
      val manifest = new Path(path, s"$ManifestPrefix$version.json")
      val tmp = new Path(path, s"$ManifestPrefix$version.json.$token.tmp")
      val out = f.create(tmp, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
      if (conditionalCommit(f, tmp, manifest)) return version
      f.delete(tmp, false)
      f.delete(new Path(snapDir), true)
      attempt += 1
    }
    throw new IllegalStateException(
      s"merge commit lost $maxAttempts races at $path — giving up")
  }

  /** Conditional keyed MERGE — delta-spark's multi-clause form
    * (`WHEN MATCHED AND cond THEN UPDATE / DELETE`,
    * `WHEN NOT MATCHED AND cond THEN INSERT`) layered as relational
    * preprocessing over the unconditional copy-on-write [[merge]]:
    *
    *  1. resolve each update row's match state and current base values
    *     in ONE pruned read (key-stats-sliced via the same metadata
    *     index the rewrite uses — the findTouchedFiles/rewrite
    *     two-phase shape Delta itself runs);
    *  2. compile the clauses row-wise: matched + `whenMatchedDelete` →
    *     delete verdict; else matched + `whenMatchedUpdate` → update
    *     row; matched with NO firing clause → the row is WITHHELD, so
    *     the base row survives untouched; unmatched +
    *     `whenNotMatchedInsert` → insert; unmatched otherwise →
    *     dropped;
    *  3. feed the compiled row set to [[merge]] — pruning, semi-join
    *     confirm, byte-identical untouched files, OCC, tags all apply
    *     unchanged.
    *
    * Conditions are Columns over the RESOLVED frame: the update row's
    * columns under their own names, the matched base row's columns as
    * `_b_<name>` (null when unmatched) — e.g.
    * `whenMatchedUpdate = Some(col("o_totalprice") > col("_b_o_totalprice"))`
    * updates only rows that grew. Delete is evaluated before update
    * (fixed clause order; make conditions disjoint if both fire).
    * `updates` must be key-unique — multiple matches per key are
    * ambiguous under conditions and refuse to commit (Delta's
    * multiple-match error).
    *
    * Isolation boundary: clause resolution is snapshot-consistent with
    * the version current at entry. If a concurrent writer commits
    * between resolution and this merge's commit, the compiled rows
    * apply to the newer version (serialized-writer deployments — the
    * tag contract's assumption — never see this; full re-execution on
    * conflict is how Delta closes the same window).
    */
  def mergeConditional(updates: DataFrame, path: String, key: String,
                       whenMatchedUpdate: Option[org.apache.spark.sql.Column] = None,
                       whenMatchedDelete: Option[org.apache.spark.sql.Column] = None,
                       whenNotMatchedInsert: Option[org.apache.spark.sql.Column] = None,
                       statsCols: Seq[String] = Nil, maxAttempts: Int = 3,
                       tag: Option[String] = None,
                       tagHorizon: Int = DefaultTagHorizon,
                       sortCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{col, lit, max => smax, min => smin}
    val spark = updates.sparkSession
    val alreadyCommitted = tag.flatMap(committedVersionOfTag(spark, path, _))
    if (alreadyCommitted.isDefined) return alreadyCommitted.get
    require(updates.groupBy(col(key)).count()
        .filter(col("count") > 1).isEmpty,
      s"conditional merge requires key-unique updates on '$key' — " +
        "multiple source rows match the same target row (ambiguous clauses)")
    val prevV = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path to merge into"))
    val schema = manifestSchema(spark, path, prevV).getOrElse(
      readVersion(spark, path, prevV).schema)
    // match-state resolution over the stats-pruned base slice
    val numericKey = schema(key).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bounds = updates.agg(smin(col(key)), smax(col(key))).head()
    val baseSlice =
      if (bounds.isNullAt(0)) read(spark, path).limit(0)
      else if (!numericKey) read(spark, path)
      else readNumericRange(spark, path, key,
        bounds.get(0).toString.toDouble, bounds.get(1).toString.toDouble)
    val b = baseSlice.select(
      schema.fieldNames.map(c => col(c).as(s"_b_$c")).toSeq: _*)
    val resolved = updates.join(b, col(key) === col(s"_b_$key"), "left")
    val matched = col(s"_b_$key").isNotNull
    val delC = whenMatchedDelete.getOrElse(lit(false))
    val updC = whenMatchedUpdate.getOrElse(lit(true))
    val insC = whenNotMatchedInsert.getOrElse(lit(true))
    val compiled = resolved
      .withColumn("_graft_del", matched && delC)
      .filter((matched && (delC || (!delC && updC))) || (!matched && insC))
      .select(schema.fieldNames.map(col).toSeq :+ col("_graft_del"): _*)
    merge(compiled, path, key, deleteCol = Some("_graft_del"),
      statsCols = statsCols, maxAttempts = maxAttempts, tag = tag,
      tagHorizon = tagHorizon, sortCols = sortCols)
  }

  /** The files [[merge]] would rewrite for these update keys, split as
    * (statsCandidates, total) — the pruning diagnostic the spec asserts
    * on (how many files the metadata prune alone excluded).
    */
  def mergeCandidateCount(spark: SparkSession, path: String, key: String,
                          lower: Double, upper: Double): (Int, Int) =
    pruneCount(spark, path, key, lower, upper)

  /** OPTIMIZE-style compaction: rewrite the CURRENT version into
    * `targetFiles` files as a new committed version — readers flip
    * atomically, the pre-compaction version stays time-travelable, and
    * a compactor dying mid-rewrite is invisible (it never commits).
    * With `sortCols` the rewrite also re-clusters (range partition +
    * in-file sort — the `OPTIMIZE ... ZORDER` shape when passed a
    * Z-key); otherwise files merge with a shuffle-free coalesce.
    * `statsCols` refreshes the data-skipping stats on the new files.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1,
              partitionCols: Seq[String] = Nil,
              statsCols: Seq[String] = Nil,
              sortCols: Seq[String] = Nil): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val cur = read(spark, path)
    val packed =
      if (sortCols.nonEmpty)
        cur.repartitionByRange(targetFiles,
            sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(
            sortCols.map(org.apache.spark.sql.functions.col): _*)
      else cur.coalesce(targetFiles)
    write(packed, path, partitionCols, statsCols = statsCols)
  }

  /** OPTIMIZE scheduling policy: compact only when the current
    * version's file count exceeds `maxFiles` — the maintenance loop
    * counterpart of [[compact]]. Merge/append churn grows the file
    * list by ~1 file per commit; calling this after each write bounds
    * the table at `maxFiles` files with amortized O(table/maxFiles)
    * rewrite work per trigger, and `sortCols` restores clustering the
    * churn eroded. Returns the compaction's committed version when it
    * ran.
    */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxFiles: Int, targetFiles: Int = 1,
                          statsCols: Seq[String] = Nil,
                          sortCols: Seq[String] = Nil): Option[Long] = {
    require(maxFiles >= 1, "maxFiles must be >= 1")
    val cur = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    if (manifestFiles(spark, path, cur).size <= maxFiles) None
    else Some(compact(spark, path, targetFiles,
      statsCols = statsCols, sortCols = sortCols))
  }

  /** Row-level change feed between two committed versions (CDC-lite —
    * the observable core of Delta's change-data-feed for
    * overwrite-refresh tables): rows only in `toVersion` are `insert`s,
    * rows only in `fromVersion` are `delete`s; an updated row appears as
    * its delete+insert pair. Multiset semantics (`exceptAll`), so
    * duplicate rows diff by count. Both sides shuffle once on the full
    * row hash — the same cost profile as the exact-dedup operator — and
    * nothing is collected to the driver.
    */
  def diff(spark: SparkSession, path: String,
           fromVersion: Long, toVersion: Long): DataFrame = {
    val from = readVersion(spark, path, fromVersion)
    val to = readVersion(spark, path, toVersion)
    import org.apache.spark.sql.functions.lit
    to.exceptAll(from).withColumn("_change", lit("insert"))
      .unionAll(from.exceptAll(to).withColumn("_change", lit("delete")))
  }

  /** Row-level changes committed BY `version` (the per-version unit the
    * table-feed stream replays, [[graft.streaming.TableFeedSource]]).
    * Three cases, cheapest first:
    *
    *  - the FIRST committed version: every row is an `insert`;
    *  - an APPEND commit (previous file list ⊂ current): exactly the
    *    freshly appended files read as `insert`s — no carried file is
    *    rescanned, so a feed over an append-mostly table is O(new data)
    *    per version, never O(table);
    *  - anything else (overwrite / compact / merge): the full multiset
    *    [[diff]] against the previous version (delete+insert pairs).
    *
    * Requires `version - 1` to still be committed (not [[vacuum]]ed) —
    * the same retention-vs-consumption contract a Delta change feed
    * draws.
    */
  def changesForVersion(spark: SparkSession, path: String,
                        version: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val vs = versions(spark, path)
    require(vs.contains(version), s"version $version not committed at $path")
    // ONLY the true first commit (version numbering starts at 1) is a
    // snapshot of inserts. The oldest SURVIVING version after a vacuum
    // must NOT silently reinterpret as a snapshot — a subscriber
    // resuming from a vacuumed offset would double-count the whole
    // table; it must fail loudly instead (the failOnDataLoss contract;
    // bootstrap-from-snapshot is the feed's getBatch(from=0) path).
    if (version == 1L)
      readVersion(spark, path, version).withColumn("_change", lit("insert"))
    else {
      require(vs.contains(version - 1),
        s"version ${version - 1} of $path was vacuumed — cannot compute " +
          s"changes for $version; resume is out of retention (re-bootstrap " +
          "from the current snapshot)")
      val prev = manifestFiles(spark, path, version - 1).toSet
      val cur = manifestFiles(spark, path, version)
      if (prev.subsetOf(cur.toSet)) {
        val fresh = cur.filterNot(prev)
        if (fresh.isEmpty)
          readVersion(spark, path, version).limit(0)
            .withColumn("_change", lit("insert"))
        else readFiles(spark, path, version, fresh)
          .withColumn("_change", lit("insert"))
      } else diff(spark, path, version - 1, version)
    }
  }

  /** Drop all snapshots and manifests older than the newest `keep`
    * versions. Never touches uncommitted (orphan) snapshot directories
    * newer than the current version — a concurrent failed writer's
    * leftovers are rewritten by its retry, not vacuumed from under it.
    * APPEND-aware: a kept (appended) version references files living in
    * OLDER versions' snapshot directories, so a directory is deleted
    * only when no surviving manifest names a file inside it.
    */
  def vacuum(spark: SparkSession, path: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val f = fs(spark, path)
    val all = versions(spark, path)
    val drop = all.dropRight(keep)
    val kept = all.takeRight(keep)
    // snapshot dirs still referenced by any surviving version
    val liveDirs: Set[String] =
      kept.flatMap(v => manifestFiles(spark, path, v))
        .map(_.split("/").head).toSet
    drop.foreach(v => f.delete(new Path(path, s"$ManifestPrefix$v.json"), false))
    // Sweep snapshot dirs: delete any dir below the kept-version floor
    // that no surviving manifest references. Versions are matched on
    // the dir-name prefix (snap-<v> legacy / snap-<v>-<token> staged),
    // NOT on the dropped-manifest list — a dir kept in an earlier
    // vacuum because an append still read it loses its manifest then,
    // and must still be collectable once a later rewrite (compact /
    // overwrite) drops the last reference.
    val floor = kept.headOption.getOrElse(Long.MaxValue)
    f.listStatus(new Path(path))
      .filter { st =>
        val n = st.getPath.getName
        st.isDirectory && n.startsWith("snap-") && !liveDirs(n) &&
          n.split("-").lift(1).flatMap(_.toLongOption).exists(_ < floor)
      }
      .foreach(st => f.delete(st.getPath, true))
    drop
  }

  /** Atomic publish of `tmp` as `dst`, failing (false) if `dst` already
    * exists. HDFS rename has exactly that contract. Local filesystems
    * do NOT (POSIX rename overwrites — two racing writers could both
    * "win"), so the local scheme commits via hard-link creation, which
    * is atomic and raises EEXIST when the destination is present — the
    * classic lock-file primitive.
    */
  private def conditionalCommit(f: FileSystem, tmp: Path, dst: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else !f.exists(dst) && f.rename(tmp, dst)

  private def listDataFiles(f: FileSystem, dir: Path): Seq[Path] = {
    val it = f.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && name.endsWith(".parquet") && !name.startsWith("_")
          && !name.startsWith(".")) buf += s.getPath
    }
    buf.toSeq
  }

  private def relativize(root: Path, file: Path): String = {
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val fileUri = file.toUri.getPath
    require(fileUri.startsWith(rootUri + "/"),
      s"data file $file escapes table root $root")
    fileUri.stripPrefix(rootUri + "/")
  }
}
