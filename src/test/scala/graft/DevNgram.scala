package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dedup_ngram / dedup_minhash warm timing. */
object DevNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $name%-20s ${(System.nanoTime() - t0) / 1e9}%7.3f s ($r rows)")
    }
    SparkEntry.entry(spark).count()
    time("ngram run1") { graft.ops.Dedup.dedupNgram(spark, sfDir).count() }
    time("ngram run2") { graft.ops.Dedup.dedupNgram(spark, sfDir).count() }
    time("ngram run3") { graft.ops.Dedup.dedupNgram(spark, sfDir).count() }
    time("minhash run1") { graft.ops.Dedup.dedupMinhash(spark, sfDir).count() }
    time("minhash run2") { graft.ops.Dedup.dedupMinhash(spark, sfDir).count() }
    spark.stop()
  }
}
