package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decontaminate / ngram hotspot timing (post explode_outer fix). */
object DevDecon {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    import graft.ops._
    time("warmup entry") { SparkEntry.entry(spark).count() }
    time("decon cold") { Curate.decontaminate(spark, sfDir).count() }
    time("decon warm") { Curate.decontaminate(spark, sfDir).count() }
    time("decon hashed warm") { Curate.decontaminateHashed(spark, sfDir).count() }
    time("ngram cold") { Dedup.dedupNgram(spark, sfDir).count() }
    time("ngram warm") { Dedup.dedupNgram(spark, sfDir).count() }
    spark.stop()
  }
}
