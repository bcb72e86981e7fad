package graft

import graft.pipeline.Expectations
import graft.pipeline.Expectations._
import org.apache.spark.sql.functions._

/** DLT-style expectations (round 18): warn keeps + counts, drop
  * removes + counts, fail kills the job; NULL conditions violate;
  * observe-path metrics equal the relational twin in one action.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, 10.0, "ok"), (2L, -5.0, "ok"), (3L, 100.0, "bad"),
    (4L, Double.NaN, "ok"), (5L, 7.0, null.asInstanceOf[String]))
    .toDF("id", "price", "status")

  test("warn keeps rows and counts; drop removes rows; NULL condition is a violation") {
    val rules = Seq(
      expect("positive_price", "price > 0"),
      expectOrDrop("status_known", "status IS NOT NULL AND status <> 'bad'"))
    val (kept, obs) = gate(fixture, rules)
    val keptIds = kept.select("id").as[Long].collect().sorted.toSeq
    // drop removes id=3 (bad) and id=5 (NULL status -> violation);
    // the warn violation (id=2 negative) stays; NaN > 0 is TRUE under
    // Spark's NaN-is-greatest ordering, so id=4 PASSES the warn rule
    assert(keptIds === Seq(1L, 2L, 4L))
    val m = obs.get
    assert(m("positive_price_violations") === 1L)
    assert(m("positive_price_passed") === 4L)
    assert(m("status_known_violations") === 2L)
    assert(m("rows_observed") === 5L)
    // the relational twin agrees row-for-row
    val rel2 = Expectations.metrics(fixture, rules).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(rel2("positive_price") === (("warn", 1L, 4L)))
    assert(rel2("status_known") === (("drop", 2L, 3L)))
  }

  test("fail kills the job on the first violating row — nothing is consumable") {
    val rules = Seq(expectOrFail("id_present", "id IS NOT NULL"))
    val bad = fixture.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], 1.0, "x"))
        .toDF("id", "price", "status")
        .select(col("id").cast("long"), col("price"), col("status")))
    val (gated, _) = gate(bad, rules)
    val e = intercept[Exception] { gated.count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("id_present")),
      s"failure must name the expectation: ${msgs(e)}")
    // a fully-passing fail rule gates through untouched
    val (ok, _) = gate(fixture, rules)
    assert(ok.count() === 5L)
  }

  test("a dropped row still fails a FAIL rule it violates (independent evaluation, DLT's reading)") {
    val rules = Seq(
      expectOrDrop("drop_bad", "status <> 'bad'"),
      expectOrFail("price_small", "price < 50"))
    // id=3 is 'bad' (would drop) AND price=100 (fails) — the batch
    // must FAIL, not silently drop the offender
    val (gated, _) = gate(fixture, rules)
    val e = intercept[Exception] { gated.count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("price_small")))
  }

  test("streaming: the gate composes per micro-batch — drop filters each batch, metrics surface through observedMetrics") {
    val root = java.nio.file.Files.createTempDirectory("graft_exp_s").toString
    val src = s"$root/src"
    Seq((1L, 5.0, "ok"), (2L, -1.0, "ok")).toDF("id", "price", "status")
      .coalesce(1).write.mode("append").parquet(src)
    Seq((3L, 2.0, "bad"), (4L, 9.0, "ok")).toDF("id", "price", "status")
      .coalesce(1).write.mode("append").parquet(src)
    val rules = Seq(
      expect("positive_price", "price > 0"),
      expectOrDrop("status_ok", "status <> 'bad'"))
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("status",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1).parquet(src)
    val gated = Expectations.gateStream(stream, rules)
    val keptTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = gated.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        keptTotal.addAndGet(b.count()): Unit
      }.start()
    try q.processAllAvailable() finally q.stop()
    // the 'bad' row dropped per-batch; warn rows kept
    assert(keptTotal.get() === 3L)
    val progress = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("expectations")))
    val viol = progress.map(r => r.getAs[Long]("positive_price_violations")).sum
    val dropped = progress.map(r => r.getAs[Long]("status_ok_violations")).sum
    assert(viol === 1L, s"one negative price across batches, got $viol")
    assert(dropped === 1L, s"one 'bad' row across batches, got $dropped")
  }

  test("the gate composes with a table write: ONE write action lands the gated rows AND materializes the metrics") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_exp_w").toString + "/t"
    val rules = Seq(
      expect("positive_price", "price > 0"),
      expectOrDrop("status_known",
        "status IS NOT NULL AND status <> 'bad'"))
    val (kept, obs) = gate(fixture, rules)
    graft.pipeline.ManifestTable.write(kept, path)
    // the write job WAS the action — the metrics are already there
    val m = obs.get
    assert(m("status_known_violations") === 2L)
    assert(m("rows_observed") === 5L)
    assert(graft.pipeline.ManifestTable.read(spark, path).count() === 3L)
  }

  test("duplicate rule names and empty rule sets refuse") {
    intercept[IllegalArgumentException] {
      gate(fixture, Seq(expect("a", "true"), expect("a", "false")))
    }
    intercept[IllegalArgumentException] { gate(fixture, Nil) }
  }

  test("PERSISTED expectations gate every write: DROP filters an append, counts land in the commit log entry, FAIL aborts, drop-rule lifecycle") {
    import graft.pipeline.ManifestTable
    val path = java.nio.file.Files
      .createTempDirectory("graft_expq").toString + "/t"
    ManifestTable.write(fixture.filter(col("id") === 1L), path)
    // declare: DROP bad/NULL statuses, WARN on non-positive price
    ManifestTable.addExpectation(spark, path, "status_known",
      "status IS NOT NULL AND status <> 'bad'", onViolation = "drop")
    ManifestTable.addExpectation(spark, path, "positive_price",
      "price > 0", onViolation = "warn")
    assert(ManifestTable.tableExpectations(spark, path) === Map(
      "status_known" -> "drop:status IS NOT NULL AND status <> 'bad'",
      "positive_price" -> "warn:price > 0"))
    // a condition that doesn't resolve refuses at DECLARE time
    val bad = intercept[IllegalArgumentException] {
      ManifestTable.addExpectation(spark, path, "typo", "no_such > 0")
    }
    assert(bad.getMessage.contains("does not resolve"))
    // the gated append: ids 2..5 — DROP removes 3 (bad) and 5 (NULL),
    // WARN counts id=2 (negative) but keeps it; NaN > 0 is true
    val v = ManifestTable.append(fixture.filter(col("id") > 1L), path)
    val ids = ManifestTable.read(spark, path)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L),
      "DROP rows must not land; WARN rows must")
    // the commit's own log entry carries per-rule counts (DLT's
    // event log) — violations observed BEFORE drop filtering
    val hm = ManifestTable.history(spark, path)
      .filter(col("version") === v)
      .select("expect_metrics").as[String].head()
    assert(hm.contains("\"status_known\":{\"violated\":2,\"passed\":2}"),
      s"log entry metrics: $hm")
    assert(hm.contains("\"positive_price\":{\"violated\":1,\"passed\":3}"),
      s"log entry metrics: $hm")
    // FAIL rule: the next batch carries a NULL id -> nothing lands
    ManifestTable.addExpectation(spark, path, "id_present",
      "id IS NOT NULL", onViolation = "fail")
    val before = ManifestTable.currentVersion(spark, path).get
    intercept[Exception] {
      ManifestTable.append(
        Seq((Option.empty[Long], 1.0, "ok"), (Some(9L), 2.0, "ok"))
          .toDF("id", "price", "status"), path)
    }
    assert(ManifestTable.currentVersion(spark, path).get === before,
      "a FAIL violation must abort the whole commit")
    // dropExpectation stops gating: the same DROP-worthy row lands
    ManifestTable.dropExpectation(spark, path, "status_known")
    ManifestTable.dropExpectation(spark, path, "id_present")
    ManifestTable.append(
      Seq((7L, 1.0, "bad")).toDF("id", "price", "status"), path)
    assert(ManifestTable.read(spark, path).filter(col("id") === 7L)
      .count() === 1L)
  }

  test("maintenance rewrites NEVER re-gate history: a DROP rule declared after ungated rows landed must not delete them in an OPTIMIZE") {
    import graft.pipeline.ManifestTable
    val path = java.nio.file.Files
      .createTempDirectory("graft_expmnt").toString + "/t"
    // ungated history including a 'bad' row (no NaN — the Z-order
    // rank cast is ANSI and would overflow on it, unrelated to the
    // property under test)
    ManifestTable.write(fixture.filter(!isnan(col("price"))), path)
    ManifestTable.addExpectation(spark, path, "status_known",
      "status IS NOT NULL AND status <> 'bad'", onViolation = "drop")
    val before = ManifestTable.read(spark, path).count()
    // compact and Z-order both re-stage EXISTING rows — the gate must
    // not fire (data loss via maintenance otherwise)
    ManifestTable.compact(spark, path, targetFiles = 1)
    assert(ManifestTable.read(spark, path).count() === before,
      "compact must not drop rows that predate the rule")
    ManifestTable.optimizeZOrder(spark, path, "id", "price",
      targetFiles = 1)
    assert(ManifestTable.read(spark, path).count() === before,
      "Z-order must not drop rows that predate the rule")
    // while a genuine APPEND still gates
    ManifestTable.append(
      Seq((9L, 1.0, "bad"), (10L, 1.0, "ok"))
        .toDF("id", "price", "status"), path)
    assert(ManifestTable.read(spark, path).count() === before + 1L,
      "the append's 'bad' row must still drop")
  }

  test("SQL DDL: ADD/DROP EXPECTATION and DESCRIBE HISTORY metrics; rules roll back with RESTORE") {
    import graft.pipeline.ManifestTable
    val path = java.nio.file.Files
      .createTempDirectory("graft_expsql").toString + "/t"
    ManifestTable.write(fixture.filter(col("id") === 1L), path) // v1
    GraftSession.withSqlExtensions(spark) { s =>
      s.sql(s"""ALTER TABLE '$path' ADD EXPECTATION status_known
                EXPECT (status IS NOT NULL AND status <> 'bad')
                ON VIOLATION DROP ROW""").collect()          // v2
      s.sql(s"ALTER TABLE '$path' ADD EXPECTATION pos " +
        "EXPECT (coalesce(price, 0.0) > 0)").collect()       // v3 (warn)
      assert(ManifestTable.tableExpectations(s, path).keySet ===
        Set("status_known", "pos"))
      // gated SQL append with real rows (the temp view registers on
      // the EXTENDED session)
      s.createDataFrame(
        Seq((2L, -5.0, "ok"), (3L, 100.0, "bad"), (4L, 4.0, "ok")))
        .toDF("id", "price", "status").createOrReplaceTempView("exp_src")
      s.sql(s"INSERT INTO '$path' SELECT * FROM exp_src").collect()
      val hist = s.sql(s"DESCRIBE HISTORY '$path'")
      assert(hist.columns.contains("expect_metrics"))
      val withMetrics = hist
        .filter(col("expect_metrics").isNotNull).count()
      assert(withMetrics >= 1L, "the gated INSERT must record metrics")
      s.sql(s"ALTER TABLE '$path' DROP EXPECTATION pos").collect()
      assert(ManifestTable.tableExpectations(s, path).keySet ===
        Set("status_known"))
    }
    // RESTORE to v1 (before any declaration) forgets the rules
    ManifestTable.restore(spark, path, 1L)
    assert(ManifestTable.tableExpectations(spark, path) === Map.empty)
    val all = ManifestTable.append(
      Seq((8L, -1.0, "bad")).toDF("id", "price", "status"), path)
    assert(ManifestTable.history(spark, path)
      .filter(col("version") === all)
      .select("expect_metrics").as[String].head() == null,
      "post-restore writes are ungated")
  }
}
