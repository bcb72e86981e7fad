package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (test classpath; never shipped). Times
  * sub-pipelines of the slow bench queries to locate hotspots.
  * Run: sbt "Test/runMain graft.DevTime <sfDir>"
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        if (dur.exists(_ > 0.5))
          println(f"STAGE ${si.stageId}%4d ${dur.getOrElse(-1.0)}%7.2f s tasks=${si.numTasks}%4d")
      }
    })

    import graft.ops._
    // warm-up
    SparkEntry.entry(spark).count()

    val emb = Tables.parallelize(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("label").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    time("emb scan+parallelize") { emb.count() }
    time("centroids") {
      emb.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx")).as("cv")).count()
    }
    time("ivf run1") { Similarity.annIvf(spark, sfDir).count() }
    time("ivf run2") { Similarity.annIvf(spark, sfDir).count() }
    time("dedup_embedding run1") { Dedup.dedupEmbedding(spark, sfDir).count() }
    time("dedup_embedding run2") { Dedup.dedupEmbedding(spark, sfDir).count() }
    time("ngram pairs alone") { Dedup.dedupNgram(spark, sfDir).count() }
    time("dedup_clusters run1") { Components.dedupClusters(spark, sfDir).count() }
    time("dedup_clusters run2") { Components.dedupClusters(spark, sfDir).count() }
    spark.stop()
  }
}
