package graft

import graft.ops.{Curate, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the optimized plan of scrub → repetition to see
  * whether the regex chain is inlined into the HOF lambdas.
  * Run: sbt "Test/runMain graft.DevRepPlan"
  */
object DevRepPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Tables.parallelize(Tables.documents(spark, "/root/testdata/sf0.001"))
    val scrubbed = raw.select(
      (Seq(col("doc_id"), col("lang"), col("source")) ++
        Text.piiScrubColumns(col("text"))): _*)
      .withColumnRenamed("clean_text", "text")
      .drop("n_emails", "n_urls", "n_numbers")
    val rep0 = Curate.withRepetitionSignals(
        scrubbed.select(col("doc_id"), col("lang"), col("source"), col("text")),
        col("text"))
      .filter(col("dup_token_frac") < 0.999 && col("top_2gram_frac") < 0.9)
      .select("doc_id", "lang", "source", "text")
    val plan = rep0.queryExecution.optimizedPlan.treeString
    // one line per operator, truncated, plus regex occurrence counts
    println("OPTIMIZED OPERATORS:")
    plan.linesIterator.foreach { l =>
      val t = l.trim
      if (t.startsWith("+-") || t.startsWith("Project") || t.startsWith("Filter")
          || t.startsWith("Relation") || t.startsWith("Repartition"))
        println("  " + t.take(200))
    }
    println("regexp_replace occurrences in optimized plan: "
      + "regexp_replace".r.findAllIn(plan).length)
    println("split occurrences: " + "split\\(".r.findAllIn(plan).length)
    println("transform occurrences: " + "transform\\(".r.findAllIn(plan).length)
    spark.stop()
  }
}
