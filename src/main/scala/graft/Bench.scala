package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // surface instead of silently timing a failure
            errors.update(name, Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // release storage leaked by finished queries (localCheckpoint
      // blocks are otherwise freed only on driver GC) so later queries
      // aren't benched under accumulated memory pressure
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errJson = if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"\"$k\":\"$v\"" }
        .mkString(",\"errors\":{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps$errJson}""")
    spark.stop()
  }
}
