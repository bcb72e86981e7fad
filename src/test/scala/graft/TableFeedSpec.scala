package graft

import graft.pipeline.ManifestTable
import graft.streaming.{TableFeedProvider, TableFeedSource}
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

  test("closed CDC loop: feed-maintained gold equals the full recompute through append and merge-with-deletes") {
    val base = java.nio.file.Files.createTempDirectory("graft_tf_gold").toString
    val table = s"$base/orders"
    val state = s"$base/gold"
    val orders = Tables.orders(spark, sfTiny)

    def recompute() = graft.pipeline.Incremental
      .dailyState(ManifestTable.read(spark, table))
      .select(col("o_custkey"), col("day"),
        col("rev_dec").cast("string"), col("cnt_rows"), col("cnt_vals"))
      .collect().map(_.toSeq).toSet
    def maintained() = ManifestTable.read(spark, state)
      .select(col("o_custkey"), col("day"),
        col("rev_dec").cast("string"), col("cnt_rows"), col("cnt_vals"))
      .collect().map(_.toSeq).toSet

    // v1: initial load → first incremental refresh
    ManifestTable.write(orders.filter(col("o_orderkey") % 2 === 0), table)
    val (m1, s1) = TableFeedSource.feedGoldDaily(spark, table, state)
    assert(m1 === 1L && s1 === 0L)
    assert(maintained() === recompute())

    // v2 append + v3 keyed merge (updates AND deletes) land upstream;
    // the SAME checkpoint resumes and consumes only the new versions
    ManifestTable.append(orders.filter(col("o_orderkey") % 2 =!= 0), table)
    val upd = orders.filter(col("o_orderkey") % 41 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      .withColumn("_del", lit(false))
    val del = orders
      .filter(col("o_orderkey") % 43 === 0 && col("o_orderkey") % 41 =!= 0)
      .withColumn("_del", lit(true))
    ManifestTable.merge(upd.unionByName(del), table, "o_orderkey",
      deleteCol = Some("_del"))
    val (m2, s2) = TableFeedSource.feedGoldDaily(spark, table, state)
    assert(m2 >= 1L && s2 === 0L)
    // retractions folded exactly: maintained state ≡ recompute, bit-level
    assert(maintained() === recompute())

    // a fresh-checkpoint replay re-offers old versions; committed tags
    // make every batch a no-op — state untouched (the exactly-once hole
    // a crash between commit and offset checkpoint would otherwise open)
    val before = ManifestTable.currentVersion(spark, state)
    val (m3, s3) = TableFeedSource.feedGoldDaily(spark, table, state,
      s"$base/ckpt_replay")
    assert(m3 === 0L && s3 >= 1L)
    assert(ManifestTable.currentVersion(spark, state) === before)
  }

  test("image-aware CDC loop: aggregate-irrelevant merges commit NO state version; relevant ones stay bit-exact") {
    val base = java.nio.file.Files.createTempDirectory("graft_tf_img").toString
    val table = s"$base/orders"
    val state = s"$base/gold"
    val orders = Tables.orders(spark, sfTiny)

    def recompute() = graft.pipeline.Incremental
      .dailyState(ManifestTable.read(spark, table))
      .select(col("o_custkey"), col("day"),
        col("rev_dec").cast("string"), col("cnt_rows"), col("cnt_vals"))
      .collect().map(_.toSeq).toSet
    def maintained() = ManifestTable.read(spark, state)
      .select(col("o_custkey"), col("day"),
        col("rev_dec").cast("string"), col("cnt_rows"), col("cnt_vals"))
      .collect().map(_.toSeq).toSet

    ManifestTable.write(orders.filter(col("o_orderkey") % 2 === 0), table)
    val (m1, s1, u1) = TableFeedSource.feedGoldDailyImages(spark, table, state)
    assert(m1 === 1L && s1 === 0L && u1 === 0L)
    assert(maintained() === recompute())

    // an aggregate-IRRELEVANT merge: o_orderpriority is not an input of
    // the daily state — pre/post group states cancel, nothing commits
    val cosmetic = ManifestTable.read(spark, table)
      .filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderpriority", lit("5-RECLASSIFIED"))
    ManifestTable.merge(cosmetic, table, "o_orderkey")
    val stateVBefore = ManifestTable.currentVersion(spark, state)
    val (m2, s2, u2) = TableFeedSource.feedGoldDailyImages(spark, table, state)
    assert(m2 === 0L && s2 === 0L && u2 === 1L,
      s"cosmetic merge must cancel: merged=$m2 skipped=$s2 unchanged=$u2")
    assert(ManifestTable.currentVersion(spark, state) === stateVBefore,
      "no state version may be committed for a cancelled batch")
    assert(maintained() === recompute())

    // an aggregate-RELEVANT merge (price doubled on a few keys, a couple
    // deleted) folds exactly — same contract as the insert/delete loop
    val upd = ManifestTable.read(spark, table)
      .filter(col("o_orderkey") % 41 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      .withColumn("_del", lit(false))
    val del = ManifestTable.read(spark, table)
      .filter(col("o_orderkey") % 43 === 0 && col("o_orderkey") % 41 =!= 0)
      .withColumn("_del", lit(true))
    ManifestTable.merge(upd.unionByName(del), table, "o_orderkey",
      deleteCol = Some("_del"))
    val (m3, _, _) = TableFeedSource.feedGoldDailyImages(spark, table, state)
    assert(m3 === 1L)
    assert(maintained() === recompute())
  }

  test("state commits are keyed merges: untouched state files carry byte-identical across a narrow refresh (r12)") {
    val base = java.nio.file.Files.createTempDirectory("graft_tf_carry").toString
    val table = s"$base/orders"
    val state = s"$base/gold"
    val orders = Tables.orders(spark, sfTiny)
    // force the keyed path (the size-adaptive default would take the
    // small-state rewrite at fixture scale)
    spark.conf.set("spark.graft.stateMergeBytes", "0")
    try {
    // two feeds over DISJOINT group sets → two state files (the second
    // feed's groups are all inserts, staged as their own file while the
    // first file carries)
    ManifestTable.write(orders.filter(col("o_custkey") % 2 === 0), table)
    TableFeedSource.feedGoldDaily(spark, table, state)
    ManifestTable.append(orders.filter(col("o_custkey") % 2 =!= 0), table)
    TableFeedSource.feedGoldDaily(spark, table, state)
    val files1 = ManifestTable.manifestFiles(spark, state,
      ManifestTable.currentVersion(spark, state).get)
    assert(files1.size >= 2, s"fixture needs ≥2 state files: $files1")
    val sig = files1.map { rel =>
      val f = new java.io.File(s"$state/$rel")
      rel -> ((f.length, f.lastModified))
    }.toMap
    // a merge touching ONE even-custkey order → one (custkey, day)
    // group changes, living in exactly one of the state files
    val one = orders.filter(col("o_custkey") % 2 === 0)
      .orderBy(col("o_orderkey")).limit(1)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
    ManifestTable.merge(one, table, "o_orderkey")
    TableFeedSource.feedGoldDaily(spark, table, state)
    val files2 = ManifestTable.manifestFiles(spark, state,
      ManifestTable.currentVersion(spark, state).get)
    val carried = files2.filter(files1.contains)
    assert(carried.nonEmpty &&
      files2.size - carried.size <= files1.size - carried.size + 1,
      s"a one-group refresh must not rewrite the world: " +
        s"v1=${files1.size} v2=${files2.size} carried=${carried.size}")
    assert(files1.size - carried.size <= 1,
      s"at most one state file may rewrite for one touched group " +
        s"(${files1.size - carried.size} rewrote)")
    carried.foreach { rel =>
      val f = new java.io.File(s"$state/$rel")
      assert((f.length, f.lastModified) === sig(rel),
        s"untouched state file $rel was rewritten")
    }
    // and the maintained state still equals the recompute
    val recompute = graft.pipeline.Incremental
      .dailyState(ManifestTable.read(spark, table))
      .select(col("o_custkey"), col("day"),
        col("rev_dec").cast("string"), col("cnt_rows"), col("cnt_vals"))
      .collect().map(_.toSeq).toSet
    val maintained = ManifestTable.read(spark, state)
      .select(col("o_custkey"), col("day"),
        col("rev_dec").cast("string"), col("cnt_rows"), col("cnt_vals"))
      .collect().map(_.toSeq).toSet
    assert(maintained === recompute)
    } finally spark.conf.unset("spark.graft.stateMergeBytes")
  }

  test("quantile twin: feed-maintained histogram state equals the recompute through retractions") {
    val base = java.nio.file.Files.createTempDirectory("graft_tf_hist").toString
    val table = s"$base/orders"
    val state = s"$base/hist"
    val orders = Tables.orders(spark, sfTiny)

    ManifestTable.write(orders.filter(col("o_orderkey") % 2 === 0), table)
    TableFeedSource.feedGoldQuantiles(spark, table, state)
    ManifestTable.append(orders.filter(col("o_orderkey") % 2 =!= 0), table)
    ManifestTable.merge(
      orders.filter(col("o_orderkey") % 43 === 0).withColumn("_d", lit(true)),
      table, "o_orderkey", deleteCol = Some("_d"))
    val (m2, _) = TableFeedSource.feedGoldQuantiles(spark, table, state)
    assert(m2 >= 1L)
    val maintained = ManifestTable.read(spark, state)
      .select(col("day").cast("string"), col("bin"), col("n"))
      .collect().map(_.toSeq).toSet
    val recomputed = graft.pipeline.Incremental
      .histogramState(ManifestTable.read(spark, table))
      .select(col("day").cast("string"), col("bin"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(maintained === recomputed,
      "deleted rows' bins must retract exactly; emptied cells must drop")

    // the heavy-tailed twin over the same history: log-bin sketch cells
    // retract the same way (one more feedMergeableGold instance)
    val skState = s"$base/sketch"
    TableFeedSource.feedGoldSketch(spark, table, skState)
    val skMaintained = ManifestTable.read(spark, skState)
      .select(col("day").cast("string"), col("bin"), col("n"))
      .collect().map(_.toSeq).toSet
    val skRecomputed = graft.pipeline.Incremental
      .ddSketchState(ManifestTable.read(spark, table))
      .select(col("day").cast("string"), col("bin"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(skMaintained === skRecomputed)
  }

  test("startingVersion bounds a fresh subscription; 'latest' skips all history (r13)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tf_sv").toString
    val table = s"$base/t"
    ManifestTable.write(Seq(1L).toDF("id"), table)   // v1
    ManifestTable.append(Seq(2L).toDF("id"), table)  // v2
    ManifestTable.append(Seq(3L).toDF("id"), table)  // v3
    val n1 = s"sv_${System.nanoTime()}"
    val q1 = TableFeedSource.readStream(spark, table,
        startingVersion = Some("2"))
      .writeStream.format("memory").queryName(n1).outputMode("append").start()
    try {
      q1.processAllAvailable()
      val got = spark.table(n1).select("id", "_commit_version")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((2L, 2L), (3L, 3L)),
        s"startingVersion=2 must deliver v2..v3 only: $got")
    } finally q1.stop()
    val n2 = s"svl_${System.nanoTime()}"
    val q2 = TableFeedSource.readStream(spark, table,
        startingVersion = Some("latest"))
      .writeStream.format("memory").queryName(n2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(n2).count() === 0,
        "'latest' must deliver nothing historical")
      ManifestTable.append(Seq(4L).toDF("id"), table) // v4, post-subscription
      q2.processAllAvailable()
      val got2 = spark.table(n2).select("id", "_commit_version")
        .as[(Long, Long)].collect().toSet
      assert(got2 === Set((4L, 4L)), s"post-subscription commit: $got2")
    } finally q2.stop()
    spark.catalog.dropTempView(n1)
    spark.catalog.dropTempView(n2): Unit
  }

  test("startingTimestamp resolves against commit wall-times; exclusive with startingVersion (r13)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tf_st").toString
    val table = s"$base/t"
    ManifestTable.write(Seq(1L).toDF("id"), table)   // v1
    Thread.sleep(20)
    ManifestTable.append(Seq(2L).toDF("id"), table)  // v2
    ManifestTable.append(Seq(3L).toDF("id"), table)  // v3
    val t2 = ManifestTable.commitTimestamp(spark, table, 2L)
    // an instant at v2's commit → first delivered version is v2
    val got = TableFeedSource.startingVersionOf(spark,
      Map("path" -> table,
        "startingTimestamp" -> new java.sql.Timestamp(t2).toString))
    assert(got === Some(2L), s"at-or-after resolution wrong: $got")
    // past the head → "latest" semantics (nothing historical)
    val head = ManifestTable.commitTimestamp(spark, table, 3L)
    val past = TableFeedSource.startingVersionOf(spark,
      Map("path" -> table,
        "startingTimestamp" -> new java.sql.Timestamp(head + 60000).toString))
    assert(past === Some(4L), s"past-head must mean latest: $past")
    // the two bounds are mutually exclusive (Delta's rule)
    intercept[IllegalArgumentException] {
      TableFeedSource.startingVersionOf(spark,
        Map("path" -> table, "startingVersion" -> "2",
          "startingTimestamp" -> new java.sql.Timestamp(t2).toString))
    }
    // end-to-end: the timestamp bound drives a real drain
    val n = s"st_${System.nanoTime()}"
    val q = spark.readStream
      .format(classOf[TableFeedProvider].getName)
      .option("path", table)
      .option("startingTimestamp", new java.sql.Timestamp(t2).toString)
      .load()
      .writeStream.format("memory").queryName(n).outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table(n).select("id", "_commit_version")
        .as[(Long, Long)].collect().toSet
      assert(rows === Set((2L, 2L), (3L, 3L)), s"drain from t2: $rows")
    } finally q.stop()
    spark.catalog.dropTempView(n): Unit
  }

  test("retention contract: fresh subscribers bootstrap from a vacuumed history, stale resumes fail loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf3").toString + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), path)      // v1
    ManifestTable.append(Seq((2L, "b")).toDF("id", "v"), path)     // v2
    ManifestTable.merge(Seq((1L, "A")).toDF("id", "v"), path, "id") // v3 (rewrite)
    ManifestTable.append(Seq((3L, "c")).toDF("id", "v"), path)     // v4
    ManifestTable.vacuum(spark, path, keep = 2)                    // v1, v2 gone

    // the oldest surviving version must NOT masquerade as a first-commit
    // snapshot for incremental consumers
    intercept[IllegalArgumentException] {
      ManifestTable.changesForVersion(spark, path, 3)
    }
    // v4's predecessor survives: incremental replay still works
    assert(ManifestTable.changesForVersion(spark, path, 4)
      .select($"id", $"v", $"_change").as[(Long, String, String)]
      .collect().toSet === Set((3L, "c", "insert")))

    // a FRESH subscription bootstraps: snapshot of v3, then v4's delta
    val qName = s"tf_boot_${System.nanoTime()}"
    val q = TableFeedSource.readStream(spark, path).writeStream
      .format("memory").queryName(qName).outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(qName)
        .select($"id", $"v", $"_change", $"_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
      assert(got === Set(
        (1L, "A", "insert", 3L), (2L, "b", "insert", 3L),
        (3L, "c", "insert", 4L)))
    } finally { q.stop(); spark.catalog.dropTempView(qName) }
  }

  test("admission control: a deep backlog drains in bounded batches with identical output") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf_adm").toString + "/t"
    ManifestTable.write(Seq((1L, "v1")).toDF("id", "v"), path)
    (2 to 10).foreach(i =>
      ManifestTable.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), path))
    // 10 pending versions, 3 per batch → 4 batches (3+3+3+1), and every
    // batch spans at most 3 commit versions
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val q = TableFeedSource.readStream(spark, path, maxVersionsPerBatch = Some(3))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batches += ((id, b.select($"_commit_version").as[Long].collect().toSet)): Unit
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batches.filter(_._2.nonEmpty)
    assert(nonEmpty.size === 4, s"expected 4 bounded batches, got $batches")
    assert(nonEmpty.forall(_._2.size <= 3),
      s"a batch exceeded the version bound: $batches")
    // the union equals the unbounded drain, version for version
    assert(nonEmpty.flatMap(_._2).toSet === (1L to 10L).toSet)
  }

  test("maxBytesPerTrigger: byte budget bounds each batch to a contiguous version prefix (r13)") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf_mb").toString + "/t"
    ManifestTable.write(Seq((1L, "v1")).toDF("id", "v"), path)
    (2 to 6).foreach(i =>
      ManifestTable.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), path))
    // a 1-byte budget admits exactly one version per batch (the
    // at-least-one rule), so 6 pending versions drain in 6 batches
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = TableFeedSource.readStream(spark, path,
        maxBytesPerTrigger = Some(1L))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += b.select($"_commit_version").as[Long].collect().toSet: Unit
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.size === 6, s"1-byte budget must drain 1 version/batch: $batches")
    assert(nonEmpty.forall(_.size === 1), s"a batch exceeded the budget: $batches")
    assert(nonEmpty.flatten.toSet === (1L to 6L).toSet)
    // a budget covering everything drains in one batch — content identical
    val path2 = java.nio.file.Files.createTempDirectory("graft_tf_mb2").toString + "/t"
    ManifestTable.write(Seq((1L, "v1")).toDF("id", "v"), path2)
    ManifestTable.append(Seq((2L, "v2")).toDF("id", "v"), path2)
    val big = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q2 = TableFeedSource.readStream(spark, path2,
        maxBytesPerTrigger = Some(Long.MaxValue / 2))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        big += b.select($"_commit_version").as[Long].collect().toSet: Unit
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(big.filter(_.nonEmpty).size === 1 &&
      big.flatten.toSet === Set(1L, 2L),
      s"a covering budget must drain in one batch: $big")
  }

  test("maxFilesPerTrigger: file-count budget bounds each batch (r13)") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf_mf").toString + "/t"
    // v1 = 1 file; v2..v4 = 2 files each (coalesce(2) on 4 rows)
    ManifestTable.write(Seq((1L, "v1")).toDF("id", "v"), path)
    (2 to 4).foreach { i =>
      val batch = (0 until 4).map(j => (i * 10L + j, s"v$i"))
        .toDF("id", "v").repartition(2)
      ManifestTable.append(batch, path)
    }
    // budget of 2 files: v1 (1 file) + nothing more fits with v2's 2?
    // 1+2=3 > 2 → v1 alone; then each 2-file version exactly fits.
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = TableFeedSource.readStream(spark, path,
        maxFilesPerTrigger = Some(2))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += b.select($"_commit_version").as[Long].collect().toSet: Unit
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.size === 4,
      s"2-file budget must drain 4 versions in 4 batches: $batches")
    assert(nonEmpty.forall(_.size === 1), s"a batch mixed versions: $batches")
    assert(nonEmpty.flatten.toSet === (1L to 4L).toSet)
  }

  test("skipChangeCommits: rewrite/delete versions are skipped whole (r13)") {
    val path = java.nio.file.Files.createTempDirectory("graft_tf_scc").toString + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)   // v1
    ManifestTable.append(Seq((3L, "c")).toDF("id", "v"), path)             // v2
    ManifestTable.deleteWhere(spark, path, $"id" === 1L)                   // v3 rewrite
    ManifestTable.append(Seq((4L, "d")).toDF("id", "v"), path)             // v4
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = TableFeedSource.readStream(spark, path, skipChangeCommits = true)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= b.select($"id", $"_change", $"_commit_version")
          .as[(Long, String, Long)].collect(): Unit
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // bootstrap v1 delivers (synthetic snapshot? no — fresh table, v1 IS
    // the first commit: delivered as inserts); v2/v4 appends deliver;
    // v3's delete NEVER surfaces — no 'delete' rows, no re-inserts
    assert(got.forall(_._2 == "insert"), s"non-insert rows leaked: $got")
    assert(got.map(r => (r._1, r._3)).toSet ===
      Set((1L, 1L), (2L, 1L), (3L, 2L), (4L, 4L)), got.toString)
    // the same feed WITHOUT the option delivers v3's delete row
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q2 = TableFeedSource.readStream(spark, path)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        all ++= b.select($"_change", $"_commit_version")
          .as[(String, Long)].collect(): Unit
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(all.contains(("delete", 3L)),
      s"default feed must deliver the delete: $all")
  }

  test("offsets are commit versions and survive serialization round-trip") {
    assert(TableFeedSource.versionOf(LongOffset(7L)) === 7L)
    assert(TableFeedSource.versionOf(SerializedOffset(LongOffset(7L).json)) === 7L)
  }
}
