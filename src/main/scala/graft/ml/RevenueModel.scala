package graft.ml

import graft.ops.Aggregates
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Daily-revenue regression — the reference's ML stage
  * (`src/utils.py:52-76`, `src/etl_pipeline.py:144-193`) rebuilt on
  * spark.ml so the training data never leaves the executors (the
  * reference collects the whole gold table to the driver via toPandas —
  * `src/etl_pipeline.py:151` — which cannot work at 100 TB).
  *
  * Features mirror the reference (`src/utils.py:55-60`): entity key,
  * day-of-week, month, avg order value; target = daily_revenue.
  * RandomForest with the reference's hyperparameters: 20 trees, seed 42,
  * 80/20 split (`src/utils.py:61-64`).
  */
object RevenueModel {

  def features(spark: SparkSession, sfDir: String): DataFrame =
    Aggregates.goldDailyRevenueUnsorted(spark, sfDir)
      .withColumn("day_of_week", dayofweek(col("day")).cast(DoubleType))
      .withColumn("month", month(col("day")).cast(DoubleType))
      .withColumn("custkey_f", col("o_custkey").cast(DoubleType))
      .withColumn("avg_order_value_f", col("avg_order_value"))
      .withColumn("label", col("daily_revenue"))

  /** Train + evaluate; returns a single-row metrics DataFrame
    * (mae / rmse / r2 — the reference's metric set, `src/utils.py:69-73`).
    * Not oracle-checked (forest implementations differ numerically);
    * the driver records rows>0 and ScalaTest asserts metric floors.
    */
  /** One pinned, parallelism-invariant train/test/fit: cache the feature
    * table (the fit, split, and metric passes would otherwise each re-run
    * the gold aggregation lineage — the reference has the same
    * multi-action recompute pattern, SURVEY §2a note on its triple
    * count()), pin partition count AND within-partition order before
    * randomSplit (the split samples per partition in row order, so
    * without this the train/test assignment — and every downstream
    * metric — would change with the session's parallelism), then fit the
    * reference-parameter forest. Caller must unpersist `data`.
    */
  private def fitPinned(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame, org.apache.spark.ml.PipelineModel) = {
    val data = features(spark, sfDir)
      .repartition(32, col("o_custkey"), col("day"))
      .sortWithinPartitions(col("o_custkey"), col("day"))
      .cache()
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), seed = 42)
    val assembler = new VectorAssembler()
      .setInputCols(Array("custkey_f", "day_of_week", "month", "avg_order_value_f"))
      .setOutputCol("features")
    val rf = new RandomForestRegressor()
      .setNumTrees(20)
      .setSeed(42)
      .setLabelCol("label")
      .setFeaturesCol("features")
    (data, train, test, new Pipeline().setStages(Array(assembler, rf)).fit(train))
  }

  /** Metrics of a fitted model on a held-out test set: mae = E|l−p|,
    * rmse = √E(l−p)², r2 = 1 − SS_res/SS_tot — the same formulas
    * RegressionEvaluator implements, but ONE pass over the (expensive)
    * model predictions instead of one per metric. SS_tot uses the
    * TWO-PASS form Σ(l−mean)² — the label-only mean pass is over the
    * raw test set, no model transform — because the one-pass
    * Σl² − (Σl)²/n identity cancels catastrophically when the label
    * mean is large relative to its spread.
    */
  private def metricsOf(spark: SparkSession,
                        model: org.apache.spark.ml.PipelineModel,
                        train: DataFrame, test: DataFrame): DataFrame = {
    val labelMean = test.agg(avg(col("label"))).head.getDouble(0)
    val pred = model.transform(test).select("label", "prediction")
    val (mae, rmse, r2, n) = regressionMetrics(pred, labelMean)
    import spark.implicits._
    Seq((mae, rmse, r2, train.count(), n))
      .toDF("mae", "rmse", "r2", "train_rows", "test_rows")
  }

  /** Metric core over (label, prediction) rows with the label mean
    * supplied by the caller's cheap first pass. Public for direct
    * testing (the large-offset-label case that kills the one-pass
    * SS_tot identity).
    */
  def regressionMetrics(pred: DataFrame,
                        labelMean: Double): (Double, Double, Double, Long) = {
    val m = pred.agg(
      avg(abs(col("label") - col("prediction"))).as("mae"),
      sqrt(avg(pow(col("label") - col("prediction"), 2))).as("rmse"),
      sum(pow(col("label") - col("prediction"), 2)).as("ss_res"),
      sum(pow(col("label") - lit(labelMean), 2)).as("ss_tot"),
      count(lit(1)).as("test_rows")).head
    (m.getDouble(0), m.getDouble(1), 1.0 - m.getDouble(2) / m.getDouble(3),
      m.getLong(4))
  }

  def trainEval(spark: SparkSession, sfDir: String): DataFrame = {
    val (data, train, test, model) = fitPinned(spark, sfDir)
    val out = metricsOf(spark, model, train, test)
    data.unpersist()
    out
  }

  /** Oracle-checkable verdict of the ML stage. Forest numerics are
    * implementation-specific (an sklearn forest and an MLlib forest
    * disagree in every decimal — the reference's metrics can never be
    * hash-matched), but the stage's CONTRACT is exactly checkable:
    *  - the 80/20 split covers the gold table exactly, no row lost or
    *    duplicated (`n_rows` = the gold group count, recomputed
    *    independently by the DuckDB oracle from the same aggregation);
    *  - the holdout fraction lands near the declared 20%;
    *  - MAE ≤ RMSE (Jensen — violated only by a broken metric pass);
    *  - the model beats the constant-mean predictor on held-out data
    *    (the weakest sane model gate);
    *  - r² clears the 0.5 floor the spec has pinned since round 2
    *    (measured ≈0.97 at sf0.001/sf0.01 — wide margin, not tuned).
    * Each clause is a boolean column; the oracle expects all true. The
    * query hash-matches iff the trained model actually works.
    */
  def trainEvalChecked(spark: SparkSession, sfDir: String): DataFrame = {
    val (data, train, test, model) = fitPinned(spark, sfDir)
    val labelMean = test.agg(avg(col("label"))).head.getDouble(0)
    val pred = model.transform(test).select("label", "prediction")
    val (mae, rmse, r2, nTest) = regressionMetrics(pred, labelMean)
    // strongest constant predictor ON the holdout: its own label mean
    val naiveMae = test.agg(avg(abs(col("label") - lit(labelMean))))
      .head.getDouble(0)
    val nTrain = train.count()
    data.unpersist()
    val frac = nTest.toDouble / (nTrain + nTest)
    import spark.implicits._
    Seq((nTrain + nTest,
         frac >= 0.1 && frac <= 0.3,
         mae > 0.0 && mae <= rmse,
         mae < naiveMae,
         r2 > 0.5 && r2 <= 1.0))
      .toDF("n_rows", "split_ok", "mae_le_rmse_ok", "beats_mean_ok", "r2_ok")
  }

  /** Per-feature importance of a fitted pipeline's forest (reference
    * `src/etl_pipeline.py:172-178`, which collects
    * `feature_importances_` into a matplotlib chart) — here a small
    * DataFrame, queryable like everything else.
    */
  def featureImportances(spark: SparkSession,
                         model: org.apache.spark.ml.PipelineModel): DataFrame = {
    import spark.implicits._
    val rf = model.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.RandomForestRegressionModel]
    val names = model.stages.head
      .asInstanceOf[org.apache.spark.ml.feature.VectorAssembler].getInputCols
    names.zip(rf.featureImportances.toArray).toSeq
      .toDF("feature", "importance")
      .orderBy(col("importance").desc, col("feature"))
  }

  /** Train, persist the model, and write metrics + importances as JSON —
    * the reference's MLflow tracking (`src/etl_pipeline.py:147-191`)
    * replaced by plain files: the model via `MLWritable.save` (reloadable
    * with `PipelineModel.load`), the run record as one JSON line.
    */
  def trainAndSave(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    // ONE model: the same pinned-split fit that trainEval uses is saved,
    // measured, and has its importances dumped — so the persisted
    // metrics/importances describe the persisted model exactly (and the
    // forest is trained once, not twice).
    val (data, train, test, model) = fitPinned(spark, sfDir)
    model.write.overwrite().save(s"$outDir/model")
    val metrics = metricsOf(spark, model, train, test)
    metrics.coalesce(1).write.mode("overwrite").json(s"$outDir/metrics")
    featureImportances(spark, model)
      .coalesce(1).write.mode("overwrite").json(s"$outDir/importances")
    data.unpersist()
    metrics
  }
}
