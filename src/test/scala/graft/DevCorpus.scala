package graft

import graft.ops.{Components, Curate, Dedup, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only corpus-pipeline stage profiler (test classpath; never
  * shipped). Times each pipeline stage in isolation at a given SF.
  * Run: sbt "Test/runMain graft.DevCorpus <sfDir> <cpus>"
  */
object DevCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 1) args(1) else "4"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val raw = Tables.parallelize(Tables.documents(spark, sfDir))
    time("raw")(raw.count())

    val scrubbed = raw.select(
      (Seq(col("doc_id"), col("lang"), col("source")) ++
        Text.piiScrubColumns(col("text"))): _*)
      .withColumnRenamed("clean_text", "text")
      .drop("n_emails", "n_urls", "n_numbers")
    time("scrub")(scrubbed.count())

    val rep0 = Curate.withRepetitionSignals(
        scrubbed.select(col("doc_id"), col("lang"), col("source"), col("text")),
        col("text"))
      .filter(col("dup_token_frac") < 0.999 && col("top_2gram_frac") < 0.9)
      .select("doc_id", "lang", "source", "text")
    time("scrub+rep")(rep0.count())
    val rep = rep0.cache()
    time("rep cache fill")(rep.count())

    val quality = Text.qualityFilterApprox(rep, dropBelow = 0.2)
      .select(col("doc_id")).join(rep, "doc_id").cache()
    time("qualityApprox")(quality.count())

    val exact = Dedup.exactDedup(quality, "text", "doc_id")
    time("exactDedup")(exact.count())

    val pairs = Dedup.ngramPairs(exact.select(col("doc_id"), col("text")))
      .select(col("doc1").as("u"), col("doc2").as("v"))
    time("ngramPairs")(pairs.count())

    val roots = Components.connectedComponents(pairs)
    time("components")(roots.count())

    val canonical = exact.join(
      roots.filter(col("node") =!= col("root")).select(col("node").as("doc_id")),
      Seq("doc_id"), "left_anti").cache()
    time("canonical")(canonical.count())

    val contaminated = Curate.contaminatedPairsTagged(
      canonical.select(col("doc_id"), col("text"),
        when(col("doc_id") % 25 === 0, 0).otherwise(1).as("_side")),
      minCommon = 4, hashed = true)
      .select(col("doc_id")).distinct()
    time("decontaminate")(contaminated.count())

    val clean = canonical.join(contaminated, Seq("doc_id"), "left_anti")
    val mixed = Curate.stratifiedSample(clean, "doc_id", "lang",
      Curate.MixRates, Curate.MixDefault).drop("sample_key")
    val split = Curate.hashSplit(mixed, "doc_id")
    val shuffled = split
      .withColumn("shuffle_key", Curate.shuffleKey(col("doc_id"), "epoch0:"))
    time("mix+split+key")(shuffled.count())

    val train = shuffled.filter(col("split") === "train")
    val packed = Curate.packChunksDistributed(
      train.select(
        concat(col("shuffle_key"),
          lpad(col("doc_id").cast("string"), 20, "0")).as("doc_id"),
        col("text")), 256)
    time("packing")(packed.count())

    val outDir = java.nio.file.Files.createTempDirectory("graft_devcorpus").toString
    time("write corpus") {
      shuffled.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")
      spark.read.parquet(s"$outDir/corpus").count()
    }
    spark.stop()
  }
}
