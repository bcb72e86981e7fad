package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: ml_train timing breakdown. */
object DevMl {
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
    SparkEntry.entry(spark).count() // warm

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val data = time("features+cache") {
      val d = graft.ml.RevenueModel.features(spark, sfDir).cache()
      d.count()
      d
    }
    println("feature partitions = " + data.rdd.getNumPartitions +
      ", rows = " + data.count())
    val Array(tr, te) = data.randomSplit(Array(0.8, 0.2), seed = 42)
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.RandomForestRegressor
    val asm = new VectorAssembler()
      .setInputCols(Array("custkey_f", "day_of_week", "month", "avg_order_value_f"))
      .setOutputCol("features")
    val trainVec = time("assemble") { val v = asm.transform(tr).cache(); v.count(); v }
    val rf = new RandomForestRegressor().setNumTrees(20).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
    val model = time("rf.fit") { rf.fit(trainVec) }
    time("transform+eval") {
      val pred = model.transform(asm.transform(te)).select("label", "prediction").cache()
      pred.count()
    }
    spark.stop()
  }
}
