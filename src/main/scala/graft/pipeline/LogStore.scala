package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable COMMIT-PUBLISH protocol — the one filesystem primitive the
  * whole ACID layer stands on (the Delta `LogStore` abstraction, Delta
  * paper VLDB'20 §3.2). Every [[ManifestTable]] commit funnels through
  * exactly one call: publish the fully-written staged manifest `tmp`
  * as `dst` IFF `dst` does not exist, atomically. Two guarantees:
  *
  *  1. MUTUAL EXCLUSION — of N racing writers targeting one version,
  *     exactly one `putIfAbsent` returns true (the OCC loop retries the
  *     losers against the next version);
  *  2. NO PARTIAL VISIBILITY — a reader either sees no manifest at
  *     `dst` or the complete bytes, never a prefix.
  *
  * Which primitive delivers that is PER STORE — the reason this is an
  * interface and not a function:
  *
  *  - POSIX filesystems: hard link ([[LogStore.HardLink]]) — atomic,
  *    fails loudly if the destination exists.
  *  - HDFS-class filesystems: rename without overwrite
  *    ([[LogStore.Rename]]) — atomic in the namenode.
  *  - S3-class object stores: **rename is a copy and is NOT atomic**,
  *    and exists-then-rename has a race window. The correct primitive
  *    is a conditional PUT (If-None-Match) or an external coordinator;
  *    [[LogStore.ObjectStore]] models the shape — upload the bytes to
  *    a staging object, then one atomic conditional MATERIALIZE at the
  *    destination key — with local primitives, and documents what a
  *    real s3a binding must supply.
  *
  * Selection is scheme-based by default ([[LogStore.forScheme]]);
  * [[ManifestTable.withLogStore]] overrides it (tests run the OCC race
  * suite against each implementation).
  */
trait LogStore {
  /** Publish `tmp` as `dst` iff absent; true = this writer won. The
    * staged `tmp` is consumed on success and left for the caller's
    * cleanup on failure. Must be atomic under concurrent callers. */
  def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean
  def name: String
}

object LogStore {

  /** POSIX hard link: `link(tmp, dst)` is atomic and EEXISTS-loud; the
    * staged file is unlinked after. */
  object HardLink extends LogStore {
    override val name = "hardlink"
    override def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** HDFS-class rename-no-overwrite: atomic in the namenode; rename
    * onto an existing destination returns false. The exists() is an
    * optimization (skip the RPC when already lost), not the guard. */
  object Rename extends LogStore {
    override val name = "rename"
    override def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean =
      !f.exists(dst) && f.rename(tmp, dst)
  }

  /** Object-store commit shape: bytes first travel to a STAGING object
    * (multipart upload — arbitrarily slow, never visible at `dst`),
    * then ONE conditional materialize makes the complete object appear
    * at the destination key atomically-or-not-at-all. Locally the
    * materialize step is a hard link of the staging copy (standing in
    * for S3 `CompleteMultipartUpload` + `If-None-Match`, which has
    * exactly these semantics since the 2024 conditional-write API); a
    * real s3a binding replaces ONLY that one call. Readers can never
    * observe partial bytes because `dst` is born complete.
    */
  object ObjectStore extends LogStore {
    override val name = "objectstore"
    override def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean = {
      // 1) upload: copy the staged bytes to a store-side staging key
      //    (distinct from tmp to model bytes leaving the writer's host)
      val staging = new Path(dst.getParent,
        s".${dst.getName}.staging-${java.util.UUID.randomUUID.toString.take(8)}")
      val in = f.open(tmp)
      val out = f.create(staging, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
      finally { in.close(); out.close() }
      // 2) conditional materialize: atomic If-None-Match at dst
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(staging.toUri.getPath))
        f.delete(staging, false)
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          f.delete(staging, false)
          false
      }
    }
  }

  /** Default binding: POSIX local → hard link; anything else → HDFS
    * rename semantics. An S3-class deployment MUST override via
    * [[ManifestTable.withLogStore]] / [[ManifestTable.setLogStore]] —
    * plain rename on an object store is the one configuration this
    * protocol cannot make safe. */
  def forScheme(scheme: String): LogStore =
    if (scheme == "file") HardLink else Rename
}
