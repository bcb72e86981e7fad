package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-phase distributed prefix sums over a global order — the building
  * block that replaces single-partition global windows (running sums,
  * global ranks) with a scale-safe plan: range-partition on the order
  * key, per-partition windows in parallel, then lift to global values
  * via the per-partition totals (one row per partition on the driver,
  * broadcast back). Used by [[Curate.packChunksDistributed]] (running
  * token sum) and [[Text.qualityFilterDist]] (global percent_rank).
  *
  * The reference never needs this (its windows are tiny aggregates,
  * `/root/reference/src/etl_pipeline.py:96-141`), but any corpus-scale
  * "position in a global order" computation does.
  */
object Prefix {

  /** Range-partition `df` by `sortCols`, sort within partitions, and
    * attach two columns: `_pid` (the pinned range-partition id) and
    * `_offset` (the sum of `weight` over all rows in earlier
    * partitions). Callers finish the prefix sum with a per-partition
    * window `Window.partitionBy("_pid").orderBy(sortCols)`.
    *
    * Returns (annotated df, grand total of `weight`). The totals pass
    * collects ONE ROW PER PARTITION — not data — so the driver step is
    * O(partitions) at any scale. [[Lineage.checkpoint]] pins the range
    * partitioning so the totals pass and the join pass see identical
    * partition boundaries (range sampling is not otherwise guaranteed
    * stable across re-evaluations).
    */
  def withOffsets(df: DataFrame, sortCols: Seq[Column], weight: Column,
                  partitions: Int = 0): (DataFrame, Long) = {
    val reserved = Seq("_w", "_pid", "_offset")
    require(!df.columns.exists(reserved.contains),
      s"input must not carry the reserved columns ${reserved.mkString(", ")} " +
        "(withColumn would silently replace them)")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val base = df
      .withColumn("_w", weight.cast(LongType))
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .transform(Lineage.checkpoint)
    val totals = base.groupBy(col("_pid"))
      .agg(sum(col("_w")).as("_ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0 -> 0L) {
      case ((_, acc), (pid, tot)) => pid -> (acc + tot)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_pid", "_offset")
    (base.join(broadcast(offsetDf), "_pid").drop("_w"),
      totals.map(_._2).sum)
  }
}
