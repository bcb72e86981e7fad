package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only: sweep every declared query's physical plan for expensive
  * expression kernels that leaked into Filter conditions (the
  * InferFiltersFromGenerate / pushdown-duplication trap). */
object DevFilterAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kernels = Seq("lambdafunction", "hyperplane_sig", "graft_simhash",
      "shingle_hashes", "concat_ws", "regexp_extract_all", "sequence(")
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if name != "stream_hourly_demand" && name != "ml_train" && name != "sessionize") {
      try {
        val plan = q(spark, sfDir).queryExecution.explainString(FormattedMode)
        val bad = plan.linesIterator
          .filter(l => l.contains("Filter ") || l.stripLeading.startsWith("Condition"))
          .filter(l => kernels.exists(l.contains))
          .toList
        if (bad.nonEmpty) {
          println(s"AUDIT $name: ${bad.size} suspicious filter line(s)")
          bad.take(2).foreach(l => println("  " + l.take(200)))
        }
      } catch {
        case e: Exception => println(s"AUDIT $name: ERROR ${e.getMessage.take(120)}")
      }
    }
    println("AUDIT done")
    spark.stop()
  }
}
