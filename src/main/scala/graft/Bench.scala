package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Measurement core, separated from main for unit testing: per query,
    * the median over SUCCESSFUL reps only (None when every rep failed —
    * a failed rep's duration measures the failure path, not the query,
    * so it must never enter the median) plus the last error message per
    * failing query.
    */
  def measure(spark: SparkSession, sfDir: String,
              queries: Seq[(String, (SparkSession, String) => DataFrame)],
              reps: Int)
      : (Seq[(String, Option[Double])], Map[String, String]) = {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            // surface instead of silently timing a failure
            errors.update(name, Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
            None
        }
      }.sorted
      // release storage leaked by finished queries (localCheckpoint
      // blocks are otherwise freed only on driver GC) so later queries
      // aren't benched under accumulated memory pressure
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      name -> (if (times.isEmpty) None else Some(times(times.length / 2)))
    }
    (results, errors.toMap)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev-only subset filter; unset (the driver's invocation) = all queries.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // Untimed warm-up: JIT/codegen the common scan→agg→join→window paths
    // once so per-query timings measure the engine, not JVM cold start.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Median of `reps` runs per query: single-run timings on a shared
    // container carry ±50% noise (NOTES round 3 — a "regression" that was
    // container variance); the median of 3 is stable round-over-round.
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3))
    val (results, errors) = measure(spark, sfDir, selected.toSeq, reps)
    val qs = results.map { case (k, v) =>
      // an all-reps-failed query reports as its error string, never a time
      "\"" + k + "\":" + v.map(_.toString).getOrElse(
        "\"ERR: " + errors.getOrElse(k, "failed") + "\"")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val errJson = if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"\"$k\":\"$v\"" }
        .mkString(",\"errors\":{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps$errJson}""")
    spark.stop()
  }
}
