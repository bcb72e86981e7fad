package graft

import graft.pipeline.ManifestTable
import graft.streaming.TableFeedSource
import org.apache.spark.sql.functions._

/** Dev probe: WARM per-phase timing of feed_gold_images (rep 2 of the
  * exact lifecycle, fresh dirs per rep).
  *   sbt "Test/runMain graft.DevFgiWarm /root/testdata/sf0.1"
  */
object DevFgiWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dev-fgi-warm",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { rep =>
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        if (rep == 2)
          println(f"[w] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val root = java.nio.file.Files.createTempDirectory(s"dev_fgi_w$rep")
      val table = root.toString + "/orders"
      val state = root.toString + "/gold"
      val orders = graft.Tables.orders(spark, sfDir)
      t("write base")(ManifestTable.write(
        orders.filter(col("o_orderkey") % 2 === 0), table))
      t("feed #1 (initial)")(
        TableFeedSource.feedGoldDailyImages(spark, table, state))
      t("cosmetic merge")(ManifestTable.merge(
        ManifestTable.read(spark, table).filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderpriority", lit("5-RECLASSIFIED")),
        table, "o_orderkey"))
      t("feed #2 (cancel)")(
        TableFeedSource.feedGoldDailyImages(spark, table, state))
      t("relevant merge")(ManifestTable.merge(
        ManifestTable.read(spark, table).filter(col("o_orderkey") % 41 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2.0),
        table, "o_orderkey"))
      t("feed #3 (fold)")(
        TableFeedSource.feedGoldDailyImages(spark, table, state))
      t("present+count")(graft.pipeline.Incremental.presentDaily(
        ManifestTable.read(spark, state)).count())
    }
    spark.stop()
  }
}
