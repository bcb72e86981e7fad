package graft

/** Dev probe: warm-rep timing of the feed_gold_images declared query.
  *   sbt "Test/runMain graft.DevFgiBench /root/testdata/sf0.1"
  */
object DevFgiBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dev-fgi-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val n = graft.streaming.TableFeedSource
        .feedGoldImagesQuery(spark, sfDir).count()
      println(f"[fgi] rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
