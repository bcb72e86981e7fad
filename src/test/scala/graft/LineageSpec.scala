package graft

import graft.ops.{Components, Graph, Lineage, Prefix}
import org.apache.spark.sql.functions._

/** Reliable-checkpoint switch (round-15 verdict item): iterative
  * operators default to `localCheckpoint` (executor blocks, zero
  * storage — fails on executor loss), and flip to RELIABLE
  * `checkpoint()` when `spark.graft.reliableCheckpoint` names a
  * directory — the recovery trade a 100 TB connected-components run
  * wants. Results must be identical in both modes; the reliable mode
  * must actually write checkpoint files into the declared directory.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](dir: String)(f: => A): A = {
    spark.conf.set(Lineage.ReliableCheckpointConf, dir)
    try f finally spark.conf.unset(Lineage.ReliableCheckpointConf)
  }

  private def rmdir(d: String): Unit = {
    val p = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(x => java.nio.file.Files.delete(x))
  }

  test("connected components: identical roots in both modes; reliable mode writes into the declared dir") {
    // two chains + a singleton pair: {1..5}, {10..13}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L)).toDF("u", "v")
    val local = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    try {
      val reliable = withReliable(dir) {
        Components.connectedComponents(edges)
          .as[(Long, Long)].collect().sortBy(_._1).toSeq
      }
      assert(reliable === local)
      assert(reliable.forall { case (n, r) =>
        (n <= 5 && r === 1L) || (n >= 10 && r === 10L) })
      // the reliable run actually materialized checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally rmdir(dir)
  }

  test("pagerank + prefix sum: identical outputs in both modes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val local = Graph.pageRank(edges, iters = 8)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val items = (1L to 200L).map(i => (i, i % 9 + 1L)).toDF("id", "w")
    val localPrefix = Prefix.withOffsets(items, Seq(col("id")), col("w"))
      ._1.select(col("id"), col("_offset")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    try {
      val (reliable, reliablePrefix) = withReliable(dir) {
        (Graph.pageRank(edges, iters = 8)
            .as[(Long, Long)].collect().sortBy(_._1).toSeq,
          Prefix.withOffsets(items, Seq(col("id")), col("w"))
            ._1.select(col("id"), col("_offset")).as[(Long, Long)]
            .collect().sortBy(_._1).toSeq)
      }
      assert(reliable === local)
      assert(reliablePrefix === localPrefix)
    } finally rmdir(dir)
  }
}
