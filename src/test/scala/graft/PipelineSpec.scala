package graft

import graft.pipeline.Medallion
import graft.ops.{Multimodal, Relational}
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("medallion pipeline: stage invariants and partition layout") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val m = new Medallion(spark, sfTiny, wh)
    val counts = m.runAll()
    assert(counts("bronze") === Tables.events(spark, sfTiny).count())
    assert(counts("silver") <= Tables.lineitem(spark, sfTiny).count())
    assert(counts("gold_daily") > 0 && counts("gold_hourly") > 0)
    // bronze is physically partitioned by year/month
    val dirs = new java.io.File(m.bronzePath).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("year=")))
    // layers are re-readable and silver rows all satisfy the clean predicates
    val silver = spark.read.parquet(m.silverPath)
    assert(silver.filter(!(col("l_quantity") > 0)).count() === 0)
    // gold daily group keys unique after round-trip (manifest-committed)
    val gd = Medallion.readTable(spark, m.goldDailyPath)
    assert(gd.select("o_custkey", "day").distinct().count() === counts("gold_daily"))
    // partition pruning actually fires: a (year, month) predicate reaches
    // the scan as a PartitionFilter and the file list shrinks to the one
    // matching directory (pruned at listing time, before any I/O)
    val bronze = spark.read.parquet(m.bronzePath)
    val pruned = bronze.filter(col("year") === 2024 && col("month") === 1)
    val scanStr = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("year"),
      s"expected partition filters in scan:\n$scanStr")
    assert(pruned.count() === counts("bronze")) // fixture spans one month
  }

  test("dynamic partition pruning: a runtime dim filter prunes bronze at execution") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_whdpp").toString
    val m = new Medallion(spark, sfTiny, wh)
    m.runBronze()
    val bronze = spark.read.parquet(m.bronzePath)
    // the dim's filter value is only known at runtime — static pruning
    // can't fire; DPP must inject a subquery filter into the scan's
    // PartitionFilters (reusing the broadcast, so it is always a win).
    // The dim must be a REAL relation: a local Seq constant-folds its
    // filter into a LocalTableScan and the pruning rule sees no
    // selective predicate to propagate.
    val dimPath = s"$wh/dim_years"
    Seq((2024, "keep"), (1999, "drop")).toDF("y", "tag")
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val joined = bronze.join(dim, bronze("year") === dim("y"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic-pruning partition filter in:\n${plan.take(1500)}")
    assert(joined.count() === bronze.count()) // fixture is all year 2024
  }

  test("silver carries a parquet bloom filter on the point-lookup key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whbloom").toString
    val m = new Medallion(spark, sfTiny, wh)
    m.runSilver()
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val file = new java.io.File(m.silverPath).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
      val orderkey = cols.find(_.getPath.toDotString == "l_orderkey").get
      assert(orderkey.getBloomFilterOffset >= 0,
        "l_orderkey should carry a bloom filter for equality skipping")
      // a column without the option stays bloom-free (no blanket cost)
      val qty = cols.find(_.getPath.toDotString == "l_quantity").get
      assert(qty.getBloomFilterOffset < 0)
    } finally reader.close()
    // point lookup through the bloom-filtered key stays correct
    val silver = spark.read.parquet(m.silverPath)
    val probe = silver.filter(col("l_orderkey") === 42)
    assert(probe.count() ===
      Relational.silverStage(Tables.lineitem(spark, sfTiny))
        .filter(col("l_orderkey") === 42).count())
  }

  test("silver clustering: row-group stats enable pruning on leading key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val m = new Medallion(spark, sfTiny, wh)
    m.runSilver()
    // after range-clustering, a leading-key point query touches a subset
    // of files: verify data correctness of the clustered copy
    val clustered = spark.read.parquet(m.silverPath)
    val expect = Relational.silverStage(Tables.lineitem(spark, sfTiny))
    assert(clustered.count() === expect.count())
    assert(clustered.filter(col("l_suppkey") === 3).count() ===
      expect.filter(col("l_suppkey") === 3).count())
  }

  test("versioned silver: Z-clustering + manifest stats give file-level data skipping") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh3").toString
    val m = new Medallion(spark, sfTiny, wh)
    m.runSilverVersioned(targetFiles = 8)
    val stats = graft.pipeline.ManifestTable
      .manifestStats(spark, m.silverVersionedPath, 1)
    assert(stats.nonEmpty && stats.values.forall(s =>
      s.contains("l_suppkey") && s.contains("l_partkey")))
    // Z-clustered files carry tight per-file ranges: a narrow partkey
    // range must skip files entirely, before any scan is planned
    val (kept, total) = graft.pipeline.ManifestTable
      .pruneCount(spark, m.silverVersionedPath, "l_partkey", 0, 24)
    assert(total >= 2, s"expected a multi-file snapshot, got $total")
    assert(kept < total, s"no files skipped ($kept of $total)")
    // pruned read ≡ full-table filter
    val pruned = graft.pipeline.ManifestTable
      .readNumericRange(spark, m.silverVersionedPath, "l_partkey", 0, 24)
      .filter(col("l_partkey").between(0, 24))
    val full = graft.pipeline.ManifestTable.read(spark, m.silverVersionedPath)
      .filter(col("l_partkey").between(0, 24))
    assert(pruned.count() === full.count() && full.count() > 0)
  }

  test("upsertPartitioned: updates replace, inserts append, untouched partitions' files untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20), (4L, "d", 20), (5L, "e", 30))
      .toDF("id", "v", "part")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    def filesOf(p: Int) = new java.io.File(s"$dir/part=$p").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq
    val before30 = filesOf(30)
    // update id=1 (part 10), insert id=9 (part 20); part 30 untouched
    val updates = Seq((1L, "A2", 10), (9L, "new", 20)).toDF("id", "v", "part")
    val n = Medallion.upsertPartitioned(spark, dir, updates, Seq("id"), "part")
    assert(n === 5) // merged rows across touched partitions 10+20: 2+3
    val after = spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet
    assert(after === Set((1L, "A2", 10), (2L, "b", 10), (3L, "c", 20),
      (4L, "d", 20), (9L, "new", 20), (5L, "e", 30)))
    // dynamic overwrite left the untouched partition's physical files alone
    assert(filesOf(30) === before30)
  }

  test("upsertPartitioned: key identity includes the partition — a key in two touched partitions keeps both rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert2").toString + "/t"
    // key 1 exists in BOTH partitions 10 and 20
    Seq((1L, "p10", 10), (1L, "p20", 20), (2L, "b", 20))
      .toDF("id", "v", "part")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    // the update targets (1, part=10) only, but partition 20 is also
    // touched by the insert — its (1, p20) row must survive the merge
    val updates = Seq((1L, "P10v2", 10), (3L, "new", 20)).toDF("id", "v", "part")
    Medallion.upsertPartitioned(spark, dir, updates, Seq("id"), "part")
    val after = spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet
    assert(after === Set((1L, "P10v2", 10), (1L, "p20", 20),
      (2L, "b", 20), (3L, "new", 20)))
  }

  test("compaction shrinks file count and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate micro-batch appends: 40 tiny files
    val src = Tables.orders(spark, sfTiny).limit(2000)
    src.repartition(40).write.mode("overwrite").parquet(dir)
    def files(d: String) = new java.io.File(d).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = files(dir)
    assert(before >= 30)
    Medallion.compact(spark, dir, targetFileBytes = 8L * 1024 * 1024)
    val after = files(dir)
    assert(after < before / 4, s"$before -> $after files")
    val back = spark.read.parquet(dir)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
  }

  test("schema-evolution read: old files surface new columns as NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    val v1 = Tables.region(spark, sfTiny).select("r_regionkey", "r_name")
    v1.write.mode("overwrite").parquet(dir)
    val v2 = Tables.region(spark, sfTiny)
      .select(col("r_regionkey"), col("r_name"))
      .withColumn("r_priority", col("r_regionkey") * 10)
    v2.write.mode("append").parquet(dir)
    val merged = Medallion.readEvolved(spark, dir)
    assert(merged.columns.contains("r_priority"))
    assert(merged.count() === v1.count() * 2)
    // old files: NULL priority; new files: populated
    assert(merged.filter(col("r_priority").isNull).count() === v1.count())
    assert(merged.filter(col("r_priority").isNotNull).count() === v1.count())
  }

  test("multimodal: mapPartitions decode plumbing matches declared query") {
    val viaDs = Multimodal.decodeMeta(spark, Multimodal.mediaTable(spark, sfTiny))
      .toDF().orderBy("doc_id")
    val viaSql = Multimodal.multimodalMeta(spark, sfTiny)
    assert(viaDs.schema.fieldNames.sorted.sameElements(viaSql.schema.fieldNames.sorted))
    val joined = viaDs.as("a").join(viaSql.as("b"), "doc_id")
      .filter(col("a.content_fp") =!= col("b.content_fp") ||
              col("a.width") =!= col("b.width") ||
              col("a.height") =!= col("b.height") ||
              col("a.n_bytes") =!= col("b.n_bytes"))
    assert(joined.count() === 0)
    assert(viaDs.count() === Tables.documents(spark, sfTiny).count())
  }

  test("streaming hourly demand equals batch gold_hourly_demand") {
    val streamed = EventsStream.hourlyDemandStream(spark, sfTiny)
    val batch = graft.ops.Aggregates.goldHourlyDemand(spark, sfTiny)
    assert(streamed.collect().toSeq === batch.collect().toSeq)
  }

  test("streaming hourly quantiles equal the batch binned recompute") {
    val width = 10.0
    val streamed = EventsStream.hourlyQuantilesStream(spark, sfTiny, width)
    val batchBinned = Tables.events(spark, sfTiny)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz")
          .as("window_start"),
        floor(col("value") / lit(width)).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"))
    val batch = graft.ops.Sketches.quantilesFromBinned(
      batchBinned, "window_start", width, Seq(0.5, 0.95),
      countName = "n_events")
    assert(streamed.collect().toSeq === batch.collect().toSeq)
    // sanity: quantiles land inside the observed value range
    val vf = streamed.agg(min("value_floor"), max("value_floor")).head()
    assert(vf.getDouble(0) >= 0.0 && vf.getDouble(1) <= 490.02)
  }

  test("ml_train metrics clear quality floor") {
    val m = graft.ml.RevenueModel.trainEval(spark, sfTiny).head()
    val (mae, rmse, r2) = (m.getDouble(0), m.getDouble(1), m.getDouble(2))
    assert(!mae.isNaN && !rmse.isNaN)
    assert(r2 > 0.5, s"r2=$r2")
  }

  test("ml_train banded verdict: split covers the gold table, all clauses true") {
    val row = graft.ml.RevenueModel.trainEvalChecked(spark, sfTiny).head()
    val goldRows = graft.ops.Aggregates
      .goldDailyRevenueUnsorted(spark, sfTiny).count()
    assert(row.getAs[Long]("n_rows") === goldRows,
      "train+test must cover the gold table exactly")
    for (c <- Seq("split_ok", "mae_le_rmse_ok", "beats_mean_ok", "r2_ok"))
      assert(row.getAs[Boolean](c), s"clause $c failed")
  }

  test("regressionMetrics survives a large label offset (two-pass SS_tot)") {
    import spark.implicits._
    // mean ~1e9, spread ~1: the one-pass Σl²−(Σl)²/n identity loses all
    // variance digits here; the two-pass form must stay exact
    val base = 1e9
    val rows = (0 until 200).map { i =>
      val label = base + (i % 7) - 3.0       // spread in [-3, 3]
      val prediction = label + (i % 3) - 1.0 // residuals in [-1, 1]
      (label, prediction)
    }
    val pred = rows.toDF("label", "prediction")
    val labelMean = rows.map(_._1).sum / rows.length
    val (mae, rmse, r2, n) =
      graft.ml.RevenueModel.regressionMetrics(pred, labelMean)
    // exact driver-side two-pass reference
    val ssRes = rows.map { case (l, p) => (l - p) * (l - p) }.sum
    val ssTot = rows.map { case (l, _) => (l - labelMean) * (l - labelMean) }.sum
    assert(n === 200L)
    assert(math.abs(mae - rows.map { case (l, p) => math.abs(l - p) }.sum / 200) < 1e-9)
    assert(math.abs(rmse - math.sqrt(ssRes / 200)) < 1e-9)
    assert(math.abs(r2 - (1.0 - ssRes / ssTot)) < 1e-9, s"r2=$r2")
    assert(r2 > 0 && r2 < 1)
  }

  test("declared change_feed_gold: CDC through the manifest equals the recomputed diff, both change kinds present") {
    val feed = Medallion.changeFeedGold(spark, sfTiny)
    assert(feed.schema.fieldNames === Array("month",
      "monthly_revenue", "order_count", "avg_order_value", "_change"))
    val byKind = feed.groupBy("_change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.getOrElse("insert", 0L) > 0, "no inserts - test is vacuous")
    assert(byKind.getOrElse("delete", 0L) > 0,
      "no deletes - the late-arriving-facts scenario must change existing rows")
    // diff through the ACID layer == diff of the two recomputed aggregates
    val orders = Tables.orders(spark, sfTiny)
    def gold(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(Det.dsum(col("o_totalprice")).as("monthly_revenue"),
        count(lit(1)).as("order_count"),
        Det.davg(col("o_totalprice")).as("avg_order_value"))
    val g1 = gold(orders.filter(col("o_orderpriority") =!= "1-URGENT"))
    val g2 = gold(orders)
    val expected = g2.exceptAll(g1).withColumn("_change", lit("insert"))
      .unionAll(g1.exceptAll(g2).withColumn("_change", lit("delete")))
    assert(feed.exceptAll(expected).isEmpty && expected.exceptAll(feed).isEmpty)
  }

  test("trainAndSave persists a reloadable model plus metrics and importances") {
    val out = java.nio.file.Files.createTempDirectory("graft_ml").toString
    graft.ml.RevenueModel.trainAndSave(spark, sfTiny, out)
    val reloaded = org.apache.spark.ml.PipelineModel.load(s"$out/model")
    val imps = graft.ml.RevenueModel.featureImportances(spark, reloaded)
    assert(imps.count() === 4)
    val total = imps.agg(sum("importance")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
    val metrics = spark.read.json(s"$out/metrics")
    assert(metrics.columns.toSet ===
      Set("mae", "rmse", "r2", "train_rows", "test_rows"))
  }
}
