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
          println(f"STAGE ${si.stageId}%4d ${dur.getOrElse(-1.0)}%7.2f s tasks=${si.numTasks}%4d  ${si.name.take(60)}")
      }
    })

    import graft.ops._
    val docs = Tables.documents(spark, sfDir)
    docs.cache().count()

    time("tokenize only") {
      docs.select(split(trim(col("text")), "\\s+").as("t"))
        .select(size(col("t")).as("n")).agg(sum("n")).count()
    }
    time("shingles only") {
      docs.select(Dedup.shingles(col("text")).as("sh"))
        .select(size(col("sh")).as("n")).agg(sum("n")).count()
    }
    time("posting explode") {
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s")).count()
    }
    time("posting + groupBy shingle") {
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("shingle"))
        .groupBy("shingle").agg(count(lit(1))).count()
    }
    time("posting explode (cached arr)") {
      val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh")).cache()
      sh.count()
      val n = sh.select(col("doc_id"), explode(col("sh")).as("s")).count()
      sh.unpersist()
      n
    }
    time("posting explode hashed") {
      docs.select(col("doc_id"),
        explode(transform(Dedup.shingles(col("text")), s => xxhash64(s))).as("s")).count()
    }
    println("docs partitions = " + docs.rdd.getNumPartitions)
    time("synthetic explode 5k x 52") {
      spark.range(5000)
        .select(col("id"), explode(sequence(lit(0), lit(51))).as("x")).count()
    }
    time("synthetic explode str arr") {
      spark.range(5000)
        .select(col("id"),
          explode(transform(sequence(lit(0), lit(51)),
            i => concat_ws(" ", i.cast("string"), i.cast("string")))).as("x"))
        .count()
    }
    println(Dedup.dedupNgram(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    time("ngram nocodegen cold") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val n = Dedup.dedupNgram(spark, sfDir).count()
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      n
    }
    time("full dedup_ngram run1") {
      Dedup.dedupNgram(spark, sfDir).count()
    }
    time("full dedup_ngram run2") {
      Dedup.dedupNgram(spark, sfDir).count()
    }
    time("full dedup_ngram run3") {
      Dedup.dedupNgram(spark, sfDir).count()
    }
    time("dedup_minhash run1") {
      Dedup.dedupMinhash(spark, sfDir).count()
    }
    time("dedup_minhash run2") {
      Dedup.dedupMinhash(spark, sfDir).count()
    }
    time("dedup_simhash run1") {
      Dedup.dedupSimhash(spark, sfDir).count()
    }
    time("dedup_simhash run2") {
      Dedup.dedupSimhash(spark, sfDir).count()
    }
    time("doc_fingerprint") {
      Text.docFingerprint(spark, sfDir).count()
    }
    spark.stop()
  }
}
