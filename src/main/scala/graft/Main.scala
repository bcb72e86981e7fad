package graft

import org.apache.spark.sql.SparkSession

/** End-to-end pipeline entry point — the reference's `src/main.py:5-14`
  * (run the whole medallion ETL + ML, log stage row counts, exit
  * non-zero on failure), minus the Python driver and MLflow server.
  *
  * Usage: runMain graft.Main <sfDir> <warehouseDir>
  */
object Main {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val warehouse = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      val counts = new pipeline.Medallion(spark, sfDir, warehouse).runAll()
      counts.toSeq.sortBy(_._1).foreach { case (stage, n) =>
        println(s"[graft] $stage: $n rows")
      }
      val metrics = ml.RevenueModel.trainAndSave(spark, sfDir, s"$warehouse/ml").head()
      println(f"[graft] ml: mae=${metrics.getDouble(0)}%.2f " +
        f"rmse=${metrics.getDouble(1)}%.2f r2=${metrics.getDouble(2)}%.4f")
      println(f"[graft] pipeline complete in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(warehouse: $warehouse)")
    } catch {
      case e: Throwable =>
        System.err.println(s"[graft] pipeline FAILED: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
