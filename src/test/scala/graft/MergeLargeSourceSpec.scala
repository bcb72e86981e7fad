package graft

import graft.pipeline.ManifestTable
import graft.pipeline.ManifestTable.{MergeInsert, MergeUpdate}
import org.apache.spark.sql.functions._

/** Large-source merge execution (round-15, the r14 verdict's one
  * named scale-killer): the confirm scan collects per-FILE flags only
  * (never the matched (file, key) pairs), DV sidecars write
  * distributively, and every source-derived join flips broadcast →
  * shuffle past `spark.graft.mergeBroadcastRows`. Both regimes are
  * THE SAME OPERATOR — this spec pins them row-identical across CoW,
  * DV, conditional-clause, and row-tracking shapes.
  */
class MergeLargeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def base() =
    (1L to 400L).map(i => (i, i % 13, s"w$i")).toDF("id", "grp", "w")

  private def source() =
    ((200L to 250L).map(i => (i, -1L, "upd", false)) ++
      (260L to 270L).map(i => (i, 0L, "del", true)) ++
      (1000L to 1020L).map(i => (i, 7L, "ins", false)))
      .toDF("id", "grp", "w", "_d")

  private def withGate[A](rows: String)(f: => A): A = {
    spark.conf.set("spark.graft.mergeBroadcastRows", rows)
    try f finally spark.conf.unset("spark.graft.mergeBroadcastRows")
  }

  private def snapshot(path: String): Seq[(Long, Long, String)] =
    ManifestTable.read(spark, path)
      .select("id", "grp", "w").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq

  test("regime parity: broadcast vs shuffle merge are row-identical (CoW upsert + deletes)") {
    val a = tmp("graft_ls1a"); val b = tmp("graft_ls1b")
    ManifestTable.write(base().repartition(6, col("id")), a,
      statsCols = Seq("id"))
    ManifestTable.write(base().repartition(6, col("id")), b,
      statsCols = Seq("id"))
    withGate("1000000") {
      ManifestTable.merge(source(), a, "id", deleteCol = Some("_d")) }
    withGate("0") { // everything past the gate -> shuffle regime
      ManifestTable.merge(source(), b, "id", deleteCol = Some("_d")) }
    assert(snapshot(a) === snapshot(b))
    assert(snapshot(a).size === 400 - 11 + 21)
  }

  test("regime parity: DV mode — delete-only files gain distributed sidecars in both regimes") {
    val a = tmp("graft_ls2a"); val b = tmp("graft_ls2b")
    // cluster by id so delete keys land in files the updates miss
    ManifestTable.write(base().repartitionByRange(8, col("id"))
      .sortWithinPartitions("id"), a, statsCols = Seq("id"))
    ManifestTable.write(base().repartitionByRange(8, col("id"))
      .sortWithinPartitions("id"), b, statsCols = Seq("id"))
    val src = ((10L to 20L).map(i => (i, 0L, "u", false)) ++
      (350L to 360L).map(i => (i, 0L, "d", true)))
      .toDF("id", "grp", "w", "_d")
    val filesBeforeA = ManifestTable.manifestFiles(spark, a,
      ManifestTable.currentVersion(spark, a).get).size
    withGate("1000000") {
      ManifestTable.merge(src, a, "id", deleteCol = Some("_d"),
        deleteVectors = true) }
    withGate("0") {
      ManifestTable.merge(src, b, "id", deleteCol = Some("_d"),
        deleteVectors = true) }
    assert(snapshot(a) === snapshot(b))
    assert(snapshot(a).size === 400 - 11)
    assert(!snapshot(a).exists(r => r._1 >= 350 && r._1 <= 360))
    // the delete-only slice rewrote NOTHING (MoR) in both regimes
    def detail(p: String) = ManifestTable.describeDetail(spark, p).head()
    assert(detail(a).getAs[Long]("num_dv_files") >= 1L)
    assert(detail(b).getAs[Long]("num_dv_files") >= 1L)
    assert(ManifestTable.manifestFiles(spark, a,
        ManifestTable.currentVersion(spark, a).get).size
      <= filesBeforeA + 1, "delete-only files kept their bytes")
  }

  test("regime parity: conditional multi-clause + composite key through mergeMultiKeyed") {
    val a = tmp("graft_ls3a"); val b = tmp("graft_ls3b")
    val t = (1L to 300L).map(i => (i % 20, i, i * 10L))
      .toDF("k1", "k2", "v")
    ManifestTable.write(t, a); ManifestTable.write(t, b)
    val src = (1L to 350L by 3).map(i => (i % 20, i, i + 1000L))
      .toDF("k1", "k2", "v")
    def run(p: String): Unit =
      ManifestTable.mergeMultiKeyed(src, p, Seq("k1", "k2"),
        matched = Seq(
          MergeUpdate(Some(col("v") > col("_b_v") / 2))),
        notMatched = Seq(MergeInsert(Some(col("v") % 2 === 0))))
    withGate("1000000")(run(a))
    withGate("0")(run(b))
    val ra = ManifestTable.read(spark, a)
      .select("k1", "k2", "v").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val rb = ManifestTable.read(spark, b)
      .select("k1", "k2", "v").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ra === rb)
  }

  test("regime parity: row tracking inherits identical ids in both regimes") {
    val a = tmp("graft_ls4a"); val b = tmp("graft_ls4b")
    def mk(p: String): Unit = {
      ManifestTable.enableRowTracking(spark, p)
      ManifestTable.write(
        (1L to 100L).map(i => (i, i * 2L)).toDF("id", "v")
          .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
        p, statsCols = Seq("id"))
    }
    mk(a); mk(b)
    val src = Seq((50L, -1L), (51L, -2L), (999L, 9L)).toDF("id", "v")
    withGate("1000000")(ManifestTable.merge(src, a, "id"): Unit)
    withGate("0")(ManifestTable.merge(src, b, "id"): Unit)
    def ids(p: String) = ManifestTable.readWithRowIds(spark, p)
      .select(col("id"), col(ManifestTable.RowIdCol))
      .as[(Long, Long)].collect().toMap
    val ia = ids(a); val ib = ids(b)
    // both tables assigned the same ids at write time (same layout),
    // so inherited ids must agree exactly
    assert(ia === ib)
    assert(ia.size === 101)
  }
}
