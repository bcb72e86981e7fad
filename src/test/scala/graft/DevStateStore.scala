package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: state-store provider A/B for the four stateful streaming
  * queries (r19 verdict "Next round #5"). Runs each declared query
  * under the default HDFS-backed provider and under RocksDB (+
  * changelog checkpointing), same JVM, warm alternation.
  *
  * Run: sbt "Test/runMain graft.DevStateStore [sfDir]"
  */
object DevStateStore {
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
    val qs = Seq("stream_hourly_quantiles", "stream_hourly_demand",
      "stream_sessionize", "stream_heavy_users")
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val key = "spark.sql.streaming.stateStore.providerClass"
    def run(name: String, provider: Option[String]): Double = {
      provider match {
        case Some(p) =>
          spark.conf.set(key, p)
          spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true")
        case None =>
          spark.conf.unset(key)
      }
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    qs.foreach(q => run(q, None))
    qs.foreach(q => run(q, Some(rocks)))
    // measured alternation, 3 reps each
    for (q <- qs) {
      val h = (1 to 3).map(_ => run(q, None)).min
      val r = (1 to 3).map(_ => run(q, Some(rocks))).min
      println(f"STATE $q%-26s hdfs=$h%6.2f s  rocksdb=$r%6.2f s  ratio=${r / h}%5.2f")
    }
    spark.stop()
  }
}
