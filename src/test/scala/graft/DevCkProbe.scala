package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: per-stage shuffle audit of merge_composite_key at the
  * 10× probe corpus. Run: sbt "Test/runMain graft.DevCkProbe" */
object DevCkProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val sw = si.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (sw > 2e6)
          println(f"STAGE ${si.stageId}%4d shufW=${sw / 1e6}%8.1f MB  " +
            f"tasks=${si.numTasks}%3d  ${si.name.take(110)}")
      }
    })
    graft.pipeline.Medallion.mergeCompositeLineitem(spark, dir).count()
    Thread.sleep(500)
    spark.stop()
  }
}
