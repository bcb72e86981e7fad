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

  /** Flattened predicate structure of a Column for driver-side stats
    * pruning: the top-level AND conjuncts, each as (functionName,
    * classified arguments) where an argument is Some(Left(attrName))
    * for a column reference, Some(Right(value)) for a literal, None
    * for anything else. Spark 4 Columns are `ColumnNode` graphs
    * (comparisons arrive as `UnresolvedFunction(">=", ...)`), and the
    * node API is private[sql] — hence this shim.
    */
  def predicateConjuncts(c: org.apache.spark.sql.Column)
      : Seq[(String, Seq[Option[Either[String, Any]]])] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit, UnresolvedAttribute => NAttr, UnresolvedFunction => NFun}
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: NFun if f.functionName.equalsIgnoreCase("and") =>
        f.arguments.flatMap(conjuncts)
      case other => Seq(other)
    }
    def classify(n: ColumnNode): Option[Either[String, Any]] = n match {
      case a: NAttr => Some(Left(a.nameParts.mkString(".")))
      case l: NLit  => Some(Right(l.value))
      case _        => None
    }
    conjuncts(c.node).collect {
      case f: NFun => f.functionName -> f.arguments.map(classify).toSeq
    }
  }

  /** The name parts of a Column that is a BARE attribute reference
    * (`col("a")`, `col("t.a")`), None for any computed expression —
    * lets callers recognize trivial no-op assignments. ColumnNode is
    * private[sql], hence this shim. */
  def bareAttribute(c: org.apache.spark.sql.Column): Option[Seq[String]] =
    c.node match {
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        Some(a.nameParts)
      case _ => None
    }

  /** Materialize a frame with TRUNCATED lineage (eager local
    * checkpoint, MEMORY_AND_DISK): downstream consumers analyze a
    * shallow LogicalRDD instead of re-walking the full source plan on
    * every action — the same mechanism delta-spark uses to materialize
    * MERGE sources. Returns the truncated frame plus a release thunk
    * that unpersists the checkpoint blocks (localCheckpoint has no
    * public unpersist; the blocks otherwise live until GC). The RDD
    * lookup is private[sql], hence this shim.
    */
  def localCheckpointReleasable(df: DataFrame): (DataFrame, () => Unit) = {
    val cp = df.localCheckpoint()
    val release: () => Unit = () =>
      cp.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false); ()
        case _ => ()
      }
    (cp, release)
  }

  /** True when the frame is already a materialized RDD scan (e.g. the
    * result of [[localCheckpointReleasable]]) — re-pinning it would be
    * pure overhead. A plan-shape check alone is NOT enough: a caller's
    * own `createDataFrame(rdd, schema)` is also a LogicalRDD but its
    * RDD may be unpersisted (and non-deterministic) — only a STORED
    * RDD counts as materialized. */
  def isMaterializedRdd(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => false
    }

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
