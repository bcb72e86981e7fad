package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: similarity_ivf cold-cost breakdown (AQE on/off). */
object DevIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def session(aqe: Boolean): SparkSession = {
      val s = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
    }
    val spark = session(aqe = true)
    SparkEntry.entry(spark).count() // warm
    time("ivf aqe-on cold") { graft.ops.Similarity.annIvf(spark, sfDir).count() }
    time("ivf aqe-on warm") { graft.ops.Similarity.annIvf(spark, sfDir).count() }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("ivf aqe-off") { graft.ops.Similarity.annIvf(spark, sfDir).count() }
    time("ivf aqe-off warm") { graft.ops.Similarity.annIvf(spark, sfDir).count() }
    spark.stop()
  }
}
