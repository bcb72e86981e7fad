package graft

import graft.pipeline.ManifestTable
import graft.streaming.TableFeedSource
import org.apache.spark.sql.functions._

/** Dev probe: phase timings of the feed_gold_images lifecycle at a
  * given SF dir — where do the seconds go?  Run:
  *   sbt "Test/runMain graft.DevFeedTime /root/testdata/sf0.1"
  */
object DevFeedTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("dev-feed-time",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("dev_feed_time")
    val table = root.toString + "/orders_fgi"
    val state = root.toString + "/gold_fgi"
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
    t("present")(graft.pipeline.Incremental.presentDaily(
      ManifestTable.read(spark, state)).count())
    spark.stop()
  }
}
