package graft

import graft.pipeline.{Incremental, ManifestTable}
import org.apache.spark.sql.functions._

/** Dev probe: phase decomposition of ONE image-fold over a merge
  * commit at sf0.1 — CDC scan vs state aggregates vs state commit.
  *   sbt "Test/runMain graft.DevFgiPhases /root/testdata/sf0.1"
  */
object DevFgiPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dev-fgi-phases",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("dev_fgi_ph")
    val table = root.toString + "/orders"
    val state = root.toString + "/gold"
    val orders = graft.Tables.orders(spark, sfDir)
    t("write base")(ManifestTable.write(
      orders.filter(col("o_orderkey") % 2 === 0), table))
    // initial fold phases
    t("v1 changes count")(
      ManifestTable.changesForVersion(spark, table, 1L, updateImages = true)
        .count())
    val ins1 = ManifestTable.changesForVersion(spark, table, 1L,
      updateImages = true).withColumn("_commit_version", lit(1L))
    val d1 = t("v1 dailyState agg")(
      { val d = Incremental.dailyState(ins1.filter(col("_change") === "insert"))
        d.cache().count(); d })
    t("v1 state write")(
      ManifestTable.write(d1.withColumn("_gkey", lit("x")), state): Unit)
    // relevant merge + its fold phases
    t("relevant merge")(ManifestTable.merge(
      ManifestTable.read(spark, table).filter(col("o_orderkey") % 41 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2.0),
      table, "o_orderkey"))
    t("v2 changes count")(
      ManifestTable.changesForVersion(spark, table, 2L, updateImages = true)
        .count())
    val b = ManifestTable.changesForVersion(spark, table, 2L,
      updateImages = true).withColumn("_commit_version", lit(2L)).cache()
    t("cache populate")(b.count())
    val pre = Incremental.dailyState(b.filter(col("_change") === "update_preimage"))
    val post = Incremental.dailyState(b.filter(col("_change") === "update_postimage"))
    val delta = t("delta build+isEmpty")(
      { val d = Incremental.mergeDailyState(
          Incremental.mergeDailyState(
            Incremental.dailyState(b.filter(col("_change") === "insert")),
            post.exceptAll(pre)),
          Incremental.negateDailyState(Incremental.mergeDailyState(
            Incremental.dailyState(b.filter(col("_change") === "delete")),
            pre.exceptAll(post))))
        d.isEmpty; d })
    t("delta count")(delta.count())
    t("state read count")(ManifestTable.read(spark, state).count())
    spark.stop()
  }
}
