package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only fuzzy-dedup stage profiler (test classpath; never shipped).
  * Run: sbt "Test/runMain graft.DevFuzzy <sfDir>"
  */
object DevFuzzy {
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
      val n = f
      println(f"TIME $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    val input = Tables.customer(spark, sfDir).select(col("c_name"))
    time("input")(input.count())
    val v = input
      .withColumn("_dv", Dedup.deletionVariants(col("c_name")))
      .select(col("c_name").as("k"), explode_outer(col("_dv")).as("v"))
      .filter(col("v").isNotNull)
    time("variants")(v.count())
    val buckets = v.groupBy(col("v"))
      .agg(collect_set(col("k")).as("ks"))
      .filter(size(col("ks")).between(2, 1000))
    time("buckets>=2")(buckets.count())
    val pairs = buckets
      .select(explode(col("ks")).as("k1"), col("ks"))
      .select(col("k1"), explode(col("ks")).as("k2"))
      .filter(col("k1") < col("k2"))
    time("raw pairs")(pairs.count())
    val confirmed = pairs
      .filter(levenshtein(col("k1"), col("k2")) <= 1)
      .distinct()
    time("confirmed+distinct")(confirmed.count())
    time("full query")(Dedup.fuzzyDedup(spark, sfDir).count())
    spark.stop()
  }
}
