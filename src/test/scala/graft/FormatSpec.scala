package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 batch named-format surface: `spark.read.format("graft")` /
  * `df.write.format("graft")` — the reference's literal I/O shape
  * (`/root/reference/src/etl_pipeline.py:66-69,77`) over ManifestTable.
  */
class FormatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouseRoot =
    java.nio.file.Files.createTempDirectory("graft_fmt_wh").toString

  private lazy val sqlSession: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .config("spark.graft.warehouse", warehouseRoot)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
  private def withSql[A](f: SparkSession => A): A = {
    val base = spark
    val s = sqlSession
    SparkSession.setActiveSession(s)
    try f(s)
    finally SparkSession.setActiveSession(base)
  }

  test("write/read round-trip by SHORT NAME: modes, partitionBy, txnTag") {
    val path = java.nio.file.Files.createTempDirectory("graft_fmt1")
      .toString + "/t"
    val df = Seq((1L, "a", 2026), (2L, "b", 2026), (3L, "c", 2027))
      .toDF("id", "v", "year")
    df.write.format("graft").mode("overwrite").partitionBy("year").save(path)
    // partitioned layout landed (k=v dirs) and reads back complete
    val st = ManifestTable.read(spark, path)
    assert(st.count() === 3)
    assert(ManifestTable.describeDetail(spark, path)
      .select("partition_columns").head().getString(0).contains("year"))
    val back = spark.read.format("graft").load(path)
    assert(back.schema.fieldNames.sorted === df.schema.fieldNames.sorted)
    assert(back.count() === 3)
    // append mode adds; an identical txnTag replay NO-OPS
    val add = Seq((4L, "d", 2027)).toDF("id", "v", "year")
    // append is unpartitioned-by-contract; the overwrite above produced
    // a partitioned layout, so overwrite flat first
    df.write.format("graft").mode("overwrite").save(path)
    add.write.format("graft").mode("append").option("txnTag", "job-1").save(path)
    add.write.format("graft").mode("append").option("txnTag", "job-1").save(path)
    assert(spark.read.format("graft").load(path).count() === 4,
      "tagged replay must not double-append")
    // errorifexists / ignore
    intercept[IllegalStateException] {
      df.write.format("graft").mode("errorifexists").save(path)
    }
    add.write.format("graft").mode("ignore").save(path) // silently keeps
    assert(spark.read.format("graft").load(path).count() === 4)
    // time-travel read options
    assert(spark.read.format("graft").option("versionAsOf", 2)
      .load(path).count() === 3)
  }

  test("replaceWhere via the writer option rewrites only the matching slice") {
    val path = java.nio.file.Files.createTempDirectory("graft_fmt2")
      .toString + "/t"
    Seq((1L, "2026-01-01", 10.0), (2L, "2026-01-01", 20.0),
        (3L, "2026-01-02", 30.0))
      .toDF("id", "day", "amt")
      .write.format("graft").mode("overwrite").save(path)
    Seq((9L, "2026-01-01", 99.0)).toDF("id", "day", "amt")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "day = '2026-01-01'").save(path)
    val got = ManifestTable.read(spark, path)
      .select("id", "amt").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((3L, 30.0), (9L, 99.0)),
      s"replaceWhere slice swap wrong: $got")
    // replaceWhere demands overwrite mode
    intercept[IllegalArgumentException] {
      Seq((9L, "2026-01-01", 99.0)).toDF("id", "day", "amt")
        .write.format("graft").mode("append")
        .option("replaceWhere", "day = '2026-01-01'").save(path)
    }
  }

  test("format read under extensions is the SAME manifest-governed vectorized scan") {
    withSql { s =>
      val path = java.nio.file.Files.createTempDirectory("graft_fmt3")
        .toString + "/t"
      s.range(0, 1000).withColumn("v", col("id") * 2)
        .write.format("graft").mode("overwrite").save(path)
      val viaFormat = s.read.format("graft").load(path).filter(col("id") < 10)
      val physical = viaFormat.queryExecution.executedPlan.toString
      // the placeholder relation must be GONE (no V1 row scan) and the
      // vectorized parquet file scan present, filter pushed
      assert(!physical.contains("GraftRelation"),
        s"V1 row scan leaked into the plan:\n$physical")
      assert(physical.contains("Parquet"), s"no parquet scan:\n$physical")
      assert(physical.contains("PushedFilters: [IsNotNull(id), LessThan(id,10)]") ||
        physical.contains("LessThan(id,10)"),
        s"filter not pushed to the scan:\n$physical")
      assert(viaFormat.count() === 10)
      // parity with the path API, row for row
      val viaPath = ManifestTable.read(s, path).filter(col("id") < 10)
      assert(viaFormat.orderBy("id").collect().toSeq ===
        viaPath.orderBy("id").collect().toSeq)
    }
  }

  test("format accepts graft:db.t names; plain sessions still read correct rows (fallback)") {
    withSql { s =>
      s.range(0, 5).toDF("id")
        .write.format("graft").mode("overwrite").save("graft:fmtdb.t1")
      assert(new java.io.File(s"$warehouseRoot/fmtdb/t1").isDirectory,
        "graft:db.t must land at the warehouse-convention location")
      assert(s.read.format("graft").load("graft:fmtdb.t1").count() === 5)
      assert(s.table("graft.fmtdb.t1").count() === 5,
        "name read and format read address the same table")
    }
    // extension-LESS session: the V1 TableScan fallback still serves
    // correct rows (slower path, correctness preserved)
    val path = java.nio.file.Files.createTempDirectory("graft_fmt4")
      .toString + "/t"
    spark.range(0, 7).toDF("id").write.format("graft")
      .mode("overwrite").save(path)
    val got = spark.read.format("graft").load(path)
      .agg(sum("id")).head().getLong(0)
    assert(got === 21L)
  }

  test("readChangeFeed options serve Delta's CDF read surface (r13)") {
    withSql { s =>
      import s.implicits._
      val path = java.nio.file.Files.createTempDirectory("graft_fmt6")
        .toString + "/t"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("graft").mode("overwrite").save(path)         // v1
      Seq((3L, "c")).toDF("id", "v")
        .write.format("graft").mode("append").save(path)            // v2
      ManifestTable.merge(Seq((1L, "A")).toDF("id", "v"), path, "id") // v3
      val cdf = s.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", 2)
        .load(path)
      assert(cdf.schema.fieldNames.takeRight(2).toSeq ===
        Seq("_change", "_commit_version"))
      val got = cdf.select("id", "v", "_change", "_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(got === Set(
        (3L, "c", "insert", 2L),
        (1L, "a", "delete", 3L),
        (1L, "A", "insert", 3L)), s"CDF rows wrong: $got")
      // endingVersion bounds the range; TVF parity
      assert(s.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", 1).option("endingVersion", 1)
        .load(path).count() === 2)
      assert(s.sql(s"SELECT * FROM graft_table_changes('$path', 2)")
        .count() === got.size)
      // startingVersion is required
      intercept[IllegalArgumentException] {
        s.read.format("graft").option("readChangeFeed", "true").load(path)
      }
      // timestamp bounds resolve against commit wall-times
      val t2 = ManifestTable.commitTimestamp(s, path, 2L)
      val byTs = s.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", t2.toString)
        .load(path)
      assert(byTs.select("_commit_version").distinct()
        .as[Long].collect().toSet === Set(2L, 3L))
      assert(s.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", t2.toString)
        .option("endingTimestamp", t2.toString)
        .load(path).select("_commit_version").distinct()
        .as[Long].collect().toSet === Set(2L))
    }
  }

  test("readStream.format(\"graft\") subscribes to the change feed by name") {
    withSql { s =>
      import graft.catalog.GraftCatalog
      GraftCatalog.saveAsTable(
        s.range(0, 3).toDF("id"), "fmtdb.feed")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_fmt5").toString
      // name-addressed on BOTH ends: subscribe by name, sink by name
      val q = s.readStream.format("graft").option("path", "graft:fmtdb.feed")
        .load()
        .writeStream.format("graft")
        .option("path", "graft:fmtdb.feed_out")
        .option("checkpointLocation", s"$ckpt/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val drained = s.table("graft.fmtdb.feed_out")
      assert(drained.count() === 3)
      assert(drained.select("_change").distinct().as[String].collect()
        .toSeq === Seq("insert"))
      assert(drained.drop("_change", "_commit_version")
        .orderBy("id").collect().toSeq ===
        s.table("graft.fmtdb.feed").orderBy("id").collect().toSeq,
        "drain by name must equal the batch read by name")
    }
  }
}
