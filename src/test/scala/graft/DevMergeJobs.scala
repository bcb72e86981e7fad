package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: job-count + wall audit of the merge-heavy declared
  * queries (r15 regression hunt). Run: sbt "Test/runMain graft.DevMergeJobs" */
object DevMergeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    def run(name: String): Unit = {
      // warm
      SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(300)
      jobs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"QJOBS $name%-24s wall=$s%7.2f s  jobs=${jobs.get()}%4d")
    }
    Seq("merge_conditional", "catalog_table_verbs", "row_tracking",
      "ndv_stats", "change_feed_merge", "merge_upsert").foreach(run)
    println("--- forced shuffle regime (gate 0: no pairs shape, no source broadcast)")
    spark.conf.set("spark.graft.mergeBroadcastRows", "0")
    Seq("merge_conditional", "catalog_table_verbs").foreach(run)
    spark.conf.unset("spark.graft.mergeBroadcastRows")
    spark.stop()
  }
}
