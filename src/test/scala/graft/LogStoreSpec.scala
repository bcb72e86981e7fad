package graft

import graft.pipeline.{LogStore, ManifestTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-11 commit-publish abstraction: every store implementation must
  * deliver the same two guarantees (mutual exclusion, no partial
  * visibility) through its own primitive — POSIX link, HDFS-style
  * rename, object-store staged PUT.
  */
class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def hadoopFs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("each store: first putIfAbsent wins, second loses, destination bytes complete, staging cleaned") {
    for (store <- Seq(LogStore.HardLink, LogStore.Rename,
        LogStore.ObjectStore)) {
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft_ls_${store.name}").toString
      val f = hadoopFs(dir)
      def stage(name: String, content: String): Path = {
        val p = new Path(dir, name)
        val out = f.create(p, true)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        p
      }
      val dst = new Path(dir, "manifest-v1.json")
      val t1 = stage("t1.tmp", "winner")
      val t2 = stage("t2.tmp", "loser")
      assert(store.putIfAbsent(f, t1, dst), s"${store.name}: first must win")
      assert(!store.putIfAbsent(f, t2, dst), s"${store.name}: second must lose")
      val got = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dst.toUri.getPath)), "UTF-8")
      assert(got === "winner", s"${store.name}: dst bytes")
      // the winner's staged tmp is consumed; the loser's survives for
      // the caller's OCC cleanup
      assert(!f.exists(t1), s"${store.name}: winner tmp must be consumed")
      assert(f.exists(t2), s"${store.name}: loser tmp is caller-owned")
      // no staging debris (ObjectStore's upload objects must not leak)
      val leftovers = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.contains("staging"))
      assert(leftovers.isEmpty, s"${store.name}: staging leak $leftovers")
    }
  }

  // Rename is deliberately absent from the RACE suite: its atomicity
  // contract is the HDFS namenode's (rename-onto-existing returns
  // false); POSIX rename overwrites, so racing it on a local fs tests
  // the wrong store. That asymmetry is the entire reason forScheme
  // binds file:// to HardLink — and this comment is the regression
  // proof (swapping Rename in here fails within a handful of runs).
  test("OCC race suite passes against the object-store and hard-link protocols: contiguous versions, serial-equivalent state") {
    for (store <- Seq(LogStore.ObjectStore, LogStore.HardLink)) {
      ManifestTable.withLogStore(store) {
        val path = java.nio.file.Files.createTempDirectory(
          s"graft_ls_occ_${store.name}").toString + "/t"
        ManifestTable.write(Seq((0L, 0L)).toDF("id", "v"), path)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
        val failures =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val tasks: Seq[Runnable] = (0 until 6).map { t =>
          new Runnable {
            def run(): Unit = try {
              (0 until 3).foreach { i =>
                ManifestTable.append(
                  Seq((100L + t * 10 + i, 1L)).toDF("id", "v"), path,
                  maxAttempts = 64)
              }
            } catch { case e: Throwable => failures.add(e); () }
          }
        }
        tasks.foreach(pool.submit)
        pool.shutdown()
        assert(pool.awaitTermination(300,
          java.util.concurrent.TimeUnit.SECONDS))
        assert(failures.isEmpty,
          s"${store.name}: writer failed: ${Option(failures.peek())}")
        val vs = ManifestTable.versions(spark, path)
        assert(vs === (1L to 19L).toSeq,
          s"${store.name}: expected 19 contiguous versions, got $vs")
        assert(ManifestTable.read(spark, path).count() === 19)
        // no half-published manifest anywhere: every version resolves
        vs.foreach(v =>
          assert(ManifestTable.readVersion(spark, path, v).count() === v))
      }
    }
  }
}
