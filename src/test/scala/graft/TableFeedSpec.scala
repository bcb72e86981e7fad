package graft

import graft.pipeline.ManifestTable
import graft.streaming.TableFeedSource
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._

/** The ManifestTable streaming source: live incremental subscription
  * (versions committed WHILE the query runs arrive as their own
  * micro-batches), the append fast path vs the diff fallback, and
  * offset (de)serialization — the checkpoint-resume surface.
  */
class TableFeedSpec extends SparkSpec {
  import spark.implicits._

  test("a running subscription picks up versions committed after it started") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf1").toString + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path) // v1
    val qName = s"tf_live_${System.nanoTime()}"
    val q = TableFeedSource.readStream(spark, path).writeStream
      .format("memory").queryName(qName).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(qName).count() === 2, "initial snapshot not replayed")

      // new commits land while the query is live
      ManifestTable.append(Seq((3L, "c")).toDF("id", "v"), path)         // v2
      ManifestTable.merge(Seq((1L, "A!")).toDF("id", "v"), path, "id")   // v3
      q.processAllAvailable()

      val got = spark.table(qName)
        .select($"id", $"v", $"_change", $"_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(got === Set(
        (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
        (3L, "c", "insert", 2L),
        (1L, "a", "delete", 3L), (1L, "A!", "insert", 3L)))
    } finally { q.stop(); spark.catalog.dropTempView(qName) }
  }

  test("append commits replay only their new files; rewrites fall back to diff") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf2").toString + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), path)        // v1
    ManifestTable.append(Seq((2L, "b")).toDF("id", "v"), path)       // v2
    // append path: exactly the appended rows, tagged insert
    val v2 = ManifestTable.changesForVersion(spark, path, 2)
      .select($"id", $"v", $"_change").as[(Long, String, String)].collect().toSet
    assert(v2 === Set((2L, "b", "insert")))
    // rewrite (compact keeps content): the diff is EMPTY — no change rows
    ManifestTable.compact(spark, path)                               // v3
    assert(ManifestTable.changesForVersion(spark, path, 3).count() === 0,
      "a content-preserving rewrite must feed zero changes")
  }

  test("offsets are commit versions and survive serialization round-trip") {
    assert(TableFeedSource.versionOf(LongOffset(7L)) === 7L)
    assert(TableFeedSource.versionOf(SerializedOffset(LongOffset(7L).json)) === 7L)
  }
}
