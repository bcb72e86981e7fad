package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * PageRank, the two-phase prefix sum).
  *
  * Default: `localCheckpoint()` — blocks live on executors, zero
  * external storage, the right call on a healthy cluster and in
  * local mode. Its trade: blocks are NOT fault-tolerant; losing an
  * executor mid-iteration FAILS the job instead of recomputing
  * (there is no lineage left to recompute from).
  *
  * `spark.graft.reliableCheckpoint=<dir>` flips every iterative
  * operator to RELIABLE `checkpoint()` into that directory (HDFS/S3
  * on a real cluster): executor loss during a 100 TB
  * connected-components run recovers from the checkpoint files
  * instead of killing hours of work. Costs one distributed write per
  * truncation — the classic reliability/throughput trade, now a
  * config switch instead of a rewrite.
  */
object Lineage {
  /** Conf key: directory for reliable checkpoints; unset = local. */
  val ReliableCheckpointConf = "spark.graft.reliableCheckpoint"

  /** Truncate `df`'s lineage — reliable `checkpoint()` when the
    * session declares a checkpoint directory, `localCheckpoint()`
    * otherwise. Eager in both modes (iterative callers measure
    * convergence on the materialized result).
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ReliableCheckpointConf)
      .map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir is idempotent for the same dir; honor a
        // caller-set dir only when it matches the declared one, so
        // two sessions' configs don't silently cross
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
