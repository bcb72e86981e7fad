package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank: Spark vs the driver-side twin, plus the
  * two round-5 verdict items — mass conservation for source-only nodes
  * (nodes with out-edges but no in-edges must keep contributing after
  * iteration 1) and bounded plan growth across iterations.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
                      scale: Long = 1000000000000L): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-computed ranks on a chain with a source-only node (mass conserved)") {
    // 5 -> 1 -> 2 -> 1: node 5 has out-edges but NO in-edges. The round-5
    // bug dropped it from the rank table after iteration 1, losing its
    // contribution to node 1 in iteration 2 (rank(1) would read 1000000).
    val edges = Seq((5L, 1L), (1L, 2L), (2L, 1L))
    val expected = Map(1L -> 1127500L, 2L -> 1722500L, 5L -> 150000L)
    assert(ranksOf(edges, iters = 2, scale = 1000000L) === expected)
    assert(Graph.pageRankLocal(edges, iters = 2, scale = 1000000L) === expected)
  }

  test("pageRank equals the local twin on an asymmetric graph with a sink node") {
    // node 9 is destination-only (no out-edges): excluded from the node
    // set by contract; 7 is source-only: retained with base rank.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 9L),
      (7L, 4L), (7L, 1L), (2L, 9L), (5L, 6L), (6L, 5L))
    val local = Graph.pageRankLocal(edges, iters = 5)
    val dist = ranksOf(edges, iters = 5)
    assert(dist === local)
    assert(!dist.contains(9L), "destination-only node leaked into the node set")
    assert(dist.contains(7L), "source-only node dropped from the node set")
  }

  test("14 iterations: plan size stays bounded and output equals the twin") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i + 1) % 40), (i, (i * 7 + 3) % 40)))
    def planLines(iters: Int) =
      Graph.pageRank(edges.toDF("src", "dst"), iters)
        .queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    // lineage truncates every 4 rounds: the plan hangs off the last
    // checkpoint plus at most 3 nested rounds — CONSTANT in iters (14
    // and 18 are both 2 rounds past their checkpoint, so identical
    // shape), never the unbounded 14-round nesting
    val p14 = planLines(14)
    assert(p14 < 150, s"plan grew with iterations ($p14 lines)")
    assert(p14 === planLines(18), "plan depth must not grow with iters")
    val df = Graph.pageRank(edges.toDF("src", "dst"), iters = 14)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Graph.pageRankLocal(edges, iters = 14))
  }

  test("declared pagerank_copurchase: deterministic, positive scores, covers the pair graph") {
    val out = Graph.pagerankCopurchase(spark, sfTiny)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
    val again = Graph.pagerankCopurchase(spark, sfTiny).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("materializeEdges=false: construction runs no jobs, result identical") {
    import spark.implicits._
    val edges = (0L until 30L).flatMap(i => Seq((i, (i + 1) % 30), (i, (i * 3 + 1) % 30)))
    // iters <= 4: below the lineage-checkpoint cadence, so the whole
    // construction is plan-only (longer runs still checkpoint ranks)
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val lazyDf = Graph.pageRank(edges.toDF("src", "dst"), iters = 3,
      materializeEdges = false)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter === jobsBefore,
      "plan construction must not run Spark jobs when edges are pre-materialized")
    val got = lazyDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Graph.pageRankLocal(edges, iters = 3))
  }
}
