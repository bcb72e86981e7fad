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
  * [[vacuum]] drops them. Concurrent writers are handled by OPTIMISTIC
  * CONCURRENCY: the manifest rename is the conditional commit (rename
  * onto an existing destination fails on HDFS/local filesystems), so a
  * writer that loses the race re-stages its snapshot under the next
  * version and retries — the Delta-style OCC loop without a log store.
  */
object ManifestTable {

  private val ManifestPrefix = "_graft_manifest-v"

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
            partitionCols: Seq[String] = Nil, maxAttempts: Int = 3): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    var attempt = 0
    while (attempt < maxAttempts) {
      val version = currentVersion(spark, path).getOrElse(0L) + 1L
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
      if (staged.isEmpty) {
        // a PARTITIONED write of zero rows emits no files at all, which
        // would commit an unreadable version — re-stage unpartitioned:
        // an empty non-partitioned parquet write keeps a schema-bearing
        // file (partition columns become ordinary empty columns)
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(snapDir)
        staged = listDataFiles(f, new Path(snapDir))
      }
      val files = staged.map(p => relativize(new Path(path), p))
      val manifest = new Path(path, s"$ManifestPrefix$version.json")
      val tmp = new Path(path, s"$ManifestPrefix$version.json.$token.tmp")
      val json =
        s"""{"version":$version,"files":[${files.map(q => "\"" + q + "\"").mkString(",")}]}"""
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
    val files = rel.map(r => s"$path/$r")
    spark.read.option("basePath", s"$path/${rel.head.split("/").head}")
      .parquet(files: _*)
  }

  /** The data files a committed manifest names (table-relative). */
  def manifestFiles(spark: SparkSession, path: String, version: Long): Seq[String] = {
    val f = fs(spark, path)
    val manifest = new Path(path, s"$ManifestPrefix$version.json")
    val in = f.open(manifest)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(node.get("version").asLong() == version,
      s"manifest $manifest names version ${node.get("version")} — corrupt table")
    val arr = node.get("files")
    (0 until arr.size()).map(arr.get(_).asText())
  }

  /** Drop all snapshots and manifests older than the newest `keep`
    * versions. Never touches uncommitted (orphan) snapshot directories
    * newer than the current version — a concurrent failed writer's
    * leftovers are rewritten by its retry, not vacuumed from under it.
    */
  def vacuum(spark: SparkSession, path: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val f = fs(spark, path)
    val drop = versions(spark, path).dropRight(keep)
    drop.foreach { v =>
      // snapshot dirs are snap-<v> (legacy/crash orphans) or
      // snap-<v>-<token> (unique staging); drop both forms for v
      f.listStatus(new Path(path))
        .filter { st =>
          val n = st.getPath.getName
          n == s"snap-$v" || n.startsWith(s"snap-$v-")
        }
        .foreach(st => f.delete(st.getPath, true))
      f.delete(new Path(path, s"$ManifestPrefix$v.json"), false)
    }
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
