package graft

/** Dev probe: warm-rep quiet timing of the round-12 commit-path
  * regressions (zorder_optimize, row_tracking) plus feed_gold_images.
  *   sbt "Test/runMain graft.DevCommitPath /root/testdata/sf0.1"
  */
object DevCommitPath {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("dev-commit-path",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("zorder_optimize", "row_tracking", "feed_gold_images")
    qs.foreach { q =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q] $q%-20s ${times.map(t => f"$t%.2f").mkString(" ")} " +
        f"(min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
