package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale probe (test classpath; never shipped) for the
  * round-15 large-source merge path: a FIXED base table takes merges
  * whose SOURCE grows 1× → 10× → 100×, under both the broadcast and
  * the forced-shuffle regime, in CoW and DV modes. Reported per run:
  *
  *   wall          — end-to-end seconds
  *   shuffle       — total shuffle-write bytes across the merge's jobs
  *   driver_bytes  — total task-result bytes returned to the driver
  *                   (the collect footprint; the r14 shape grew this
  *                   with the source, the r15 shape must stay ~flat —
  *                   per-FILE flags only)
  *
  * Run: sbt "Test/runMain graft.DevMergeScale"
  */
object DevMergeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    @volatile var shuffleBytes = 0L
    @volatile var resultBytes = 0L
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shuffleBytes += m.shuffleWriteMetrics.bytesWritten
          resultBytes += m.resultSize
        }
      }
    })

    val root = java.nio.file.Files.createTempDirectory("graft_msc").toString
    val baseN = 2000000L
    def mkBase(path: String): Unit =
      ManifestTable.write(
        spark.range(baseN).select(col("id"),
            (col("id") % 1000L).as("v"),
            concat(lit("w"), col("id")).as("w"))
          .repartitionByRange(32, col("id")).sortWithinPartitions("id"),
        path, statsCols = Seq("id")): Unit

    def src(n: Long) = spark.range(n).select(
      // half update existing keys, quarter delete, quarter insert new
      when(col("id") % 4L < 2L, col("id") * (baseN / n).max(1L))
        .when(col("id") % 4L === 2L, col("id") * (baseN / n).max(1L) + 1L)
        .otherwise(col("id") + baseN * 2L).as("id"),
      lit(-1L).as("v"), lit("src").as("w"),
      (col("id") % 4L === 2L).as("_d"))

    def run(tag: String, n: Long, gate: String, dv: Boolean): Unit = {
      val path = s"$root/t_${tag}_${n}_${gate}_$dv"
      mkBase(path)
      Thread.sleep(400) // drain listener events from the base write
      shuffleBytes = 0L; resultBytes = 0L
      spark.conf.set("spark.graft.mergeBroadcastRows", gate)
      val t0 = System.nanoTime()
      try ManifestTable.merge(src(n), path, "id", deleteCol = Some("_d"),
        deleteVectors = dv): Unit
      finally spark.conf.unset("spark.graft.mergeBroadcastRows")
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let trailing task-end events land
      println(f"PROBE $tag%-8s src=$n%9d gate=$gate%-8s dv=$dv%-5s " +
        f"wall=$wall%7.2f s  shuffle=${shuffleBytes / 1e6}%9.1f MB  " +
        f"driver_bytes=${resultBytes / 1e6}%8.2f MB")
    }

    // warm-up (class loading, codegen)
    run("warmup", 20000L, "4194304", dv = false)
    println("--- CoW, broadcast regime (default gate) vs shuffle regime (gate 0)")
    Seq(20000L, 200000L, 2000000L).foreach(n =>
      run("cow_bc", n, "4194304", dv = false))
    Seq(20000L, 200000L, 2000000L).foreach(n =>
      run("cow_sh", n, "0", dv = false))
    println("--- DV mode (distributed sidecar write)")
    Seq(20000L, 200000L, 2000000L).foreach(n =>
      run("dv_bc", n, "4194304", dv = true))
    Seq(20000L, 200000L, 2000000L).foreach(n =>
      run("dv_sh", n, "0", dv = true))
    spark.stop()
  }
}
