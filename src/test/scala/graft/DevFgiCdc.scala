package graft

import graft.pipeline.{Incremental, ManifestTable}
import org.apache.spark.sql.functions._

/** Dev probe: WARM decomposition of the image-fold over the cosmetic
  * merge — CDC classification vs state aggregates vs exceptAll.
  *   sbt "Test/runMain graft.DevFgiCdc /root/testdata/sf0.1"
  */
object DevFgiCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dev-fgi-cdc",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { rep =>
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        if (rep == 2)
          println(f"[c] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val root = java.nio.file.Files.createTempDirectory(s"dev_fgi_c$rep")
      val table = root.toString + "/orders"
      val orders = graft.Tables.orders(spark, sfDir)
      ManifestTable.write(orders.filter(col("o_orderkey") % 2 === 0), table)
      ManifestTable.merge(
        ManifestTable.read(spark, table).filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderpriority", lit("5-RECLASSIFIED")),
        table, "o_orderkey")
      val cdc = ManifestTable.changesForVersion(spark, table, 2L,
        updateImages = true).withColumn("_commit_version", lit(2L))
      t("cdc classify count")(cdc.count())
      val b = cdc.cache()
      t("cache populate")(b.count())
      val pre0 = Incremental.dailyState(
        b.filter(col("_change") === "update_preimage"))
      val post0 = Incremental.dailyState(
        b.filter(col("_change") === "update_postimage"))
      t("pre agg count")(pre0.count())
      t("post agg count")(post0.count())
      val pre = pre0.cache(); val post = post0.cache()
      pre.count(); post.count()
      t("exceptAll pair (cached)")(
        post.exceptAll(pre).count() + pre.exceptAll(post).count())
      val delta = Incremental.mergeDailyState(
        Incremental.mergeDailyState(
          Incremental.dailyState(b.filter(col("_change") === "insert")),
          post.exceptAll(pre)),
        Incremental.negateDailyState(Incremental.mergeDailyState(
          Incremental.dailyState(b.filter(col("_change") === "delete")),
          pre.exceptAll(post))))
      t("delta isEmpty (cached pp)")(delta.isEmpty)
      pre.unpersist(); post.unpersist(); b.unpersist()
    }
    spark.stop()
  }
}
