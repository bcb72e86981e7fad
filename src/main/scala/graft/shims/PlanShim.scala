/* Lives under org.apache.spark.sql so it can reach the private[sql]
 * Dataset.ofRows constructor — the standard mechanism third-party Spark
 * operator libraries use to hand a custom LogicalPlan to a session.
 * This is the ONLY internal access in the project; everything else is
 * public API. Source stays in graft's repo (src/main/scala/graft/shims).
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-tag a fully-planned BATCH frame as a streaming micro-batch —
    * what a V1 streaming `Source.getBatch` must hand the engine (the
    * same `internalCreateDataFrame(isStreaming = true)` call Spark's
    * own FileStreamSource makes; private[sql], hence this shim).
    */
  def asMicroBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
