package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** NDV statistics index: per-file HLL sketches + row counts built at
  * commit time, merged (never rescanned) at query time.
  */
class NdvStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def within(est: Long, exact: Long, pct: Double): Boolean =
    math.abs(est - exact) <= pct * exact

  test("ndvEstimate within 5% and rowCountFromStats exact, through append and merge") {
    val path = tmp("graft_ndv1")
    ManifestTable.setNdvStats(spark, path, Seq("k", "id"))
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("k", pmod(col("id") * 2654435761L, lit(997)))
      .repartitionByRange(8, col("id")).sortWithinPartitions(col("id"))
    ManifestTable.write(df, path)
    val (e1, c1, t1) = ManifestTable.ndvEstimate(spark, path, "k")
    assert(c1 === t1 && t1 === 8)
    assert(within(e1, 997, 0.05), s"k ndv est $e1 vs 997")
    val (n1, _, _) = ManifestTable.rowCountFromStats(spark, path)
    assert(n1 === 5000L)

    // append extends coverage without touching earlier sidecars
    ManifestTable.append(spark.range(5000, 6000).toDF("id")
      .withColumn("k", lit(9999L)), path)
    val (e2, c2, t2) = ManifestTable.ndvEstimate(spark, path, "k")
    assert(c2 === t2)
    assert(within(e2, 998, 0.05), s"k ndv est after append $e2 vs 998")
    assert(ManifestTable.rowCountFromStats(spark, path)._1 === 6000L)

    // a merge rewrite re-sketches only its touched files
    ManifestTable.merge(Seq((3L, 42L)).toDF("id", "k"), path, "id")
    val (e3, c3, t3) = ManifestTable.ndvEstimate(spark, path, "id")
    assert(c3 === t3)
    assert(within(e3, 6000, 0.05), s"id ndv est after merge $e3 vs 6000")
    assert(ManifestTable.rowCountFromStats(spark, path)._1 === 6000L)
  }

  test("pre-index files report partial coverage; compact restores full coverage; clone and vacuum keep sidecars straight") {
    val path = tmp("graft_ndv2")
    ManifestTable.write(spark.range(0, 1000).toDF("id")
      .withColumn("k", col("id") % 50), path)           // v1: NO index yet
    ManifestTable.setNdvStats(spark, path, Seq("k"))     // v2
    ManifestTable.append(spark.range(1000, 1500).toDF("id")
      .withColumn("k", col("id") % 50), path)            // v3: indexed files
    val (_, covered, total) = ManifestTable.ndvEstimate(spark, path, "k")
    assert(covered < total && covered >= 1,
      s"pre-index files must report partial coverage: $covered of $total")
    // compact rewrites everything -> full coverage
    ManifestTable.compact(spark, path, targetFiles = 2)
    val (e, c2, t2) = ManifestTable.ndvEstimate(spark, path, "k")
    assert(c2 === t2 && t2 === 2)
    assert(within(e, 50, 0.05), s"k ndv est $e vs 50")
    assert(ManifestTable.rowCountFromStats(spark, path)._1 === 1500L)
    // clone carries the index and its sidecars
    val dst = tmp("graft_ndv2d")
    ManifestTable.cloneShallow(spark, path, dst)
    val (ec, cc, tc) = ManifestTable.ndvEstimate(spark, dst, "k")
    assert(cc === tc && within(ec, 50, 0.05))
    // vacuum sweeps the dead sidecar dirs, keeps the live ones working
    ManifestTable.vacuum(spark, path, keep = 1)
    val names = new java.io.File(path).listFiles.map(_.getName)
    assert(names.count(_.startsWith("ndv-")) === 1,
      s"vacuum must sweep dead ndv sidecar dirs: ${names.toSeq}")
    assert(within(ManifestTable.ndvEstimate(spark, path, "k")._1, 50, 0.05))
  }

  test("joinWithStats: committed row counts drive the broadcast decision (no build-side scan or size guess)") {
    val path = tmp("graft_ndv3")
    ManifestTable.setNdvStats(spark, path, Seq("k"))
    ManifestTable.write(spark.range(0, 500).toDF("k")
      .withColumn("dim_v", col("k") * 7), path)
    val facts = spark.range(0, 5000).toDF("k")
    // disable Spark's own size-based auto-broadcast so the plan shape
    // can only come from the stats-driven hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val small = graft.api.GraftOps.joinWithStats(facts, path, Seq("k"))
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "stats say 500 rows -> the dimension must broadcast")
      assert(small.count() === 500)
      val big = graft.api.GraftOps.joinWithStats(facts, path, Seq("k"),
        broadcastMaxRows = 10)
      assert(!big.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "stats above the bound must fall through to Spark's planning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("readAuto closes the CBO loop: a star join over manifest sources broadcasts BOTH stats-proven dims with auto-broadcast disabled") {
    val dim1 = tmp("graft_ndv4a")
    val dim2 = tmp("graft_ndv4b")
    val fact = tmp("graft_ndv4f")
    ManifestTable.setNdvStats(spark, dim1, Seq("k1"))
    ManifestTable.write(spark.range(0, 300).toDF("k1")
      .withColumn("d1", col("k1") * 3), dim1)
    ManifestTable.setNdvStats(spark, dim2, Seq("k2"))
    ManifestTable.write(spark.range(0, 400).toDF("k2")
      .withColumn("d2", col("k2") * 5), dim2)
    // the fact table has NO ndv index — it must never hint
    ManifestTable.write(spark.range(0, 20000).toDF("id")
      .withColumn("k1", col("id") % 300)
      .withColumn("k2", col("id") % 400), fact)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val star = ManifestTable.readAuto(spark, fact)
        .join(ManifestTable.readAuto(spark, dim1), Seq("k1"))
        .join(ManifestTable.readAuto(spark, dim2), Seq("k2"))
      val plan = star.queryExecution.executedPlan.toString
      val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
      assert(broadcasts === 2,
        s"both stats-proven dims must broadcast (got $broadcasts):\n$plan")
      assert(star.count() === 20000)
      // an evolved append that OMITS the indexed column must not shrink
      // the row count (reserved per-file rowcount entry, not head-col)
      ManifestTable.append(spark.range(0, 50).toDF("k1")
        .withColumn("extra", col("k1") + 1).drop("k1")
        .withColumn("k1", lit(5L)).select("k1", "extra"), dim1)
      val (rows, covered, total) = ManifestTable.rowCountFromStats(spark, dim1)
      assert(covered === total, s"evolved append must stay covered: $covered/$total")
      assert(rows === 350L, s"row count must include the evolved append: $rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
