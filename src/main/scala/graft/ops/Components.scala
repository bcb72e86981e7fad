package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over a pair/edge list — the step that turns the
  * dedup family's near-duplicate PAIRS (graft.ops.Dedup) into duplicate
  * CLUSTERS with one canonical document each, which is what a training
  * -data pipeline actually deletes against. The reference has no analog
  * (it has no text processing at all); this extends the north-star dedup
  * surface (BASELINE.json).
  *
  * Algorithm: alternating Large-Star / Small-Star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
  * MapReduce and Beyond", SoCC 2014). Each round is two shuffle stages
  * (one per star op); the edge set converges to stars centered at each
  * component's minimum id in O(log² n) rounds (2–5 in practice — near
  * -dup graphs are near-cliques). This is the 100 TB-safe choice: naive
  * min-label propagation needs O(graph diameter) rounds, which is O(n)
  * on a chain of pairwise-similar documents.
  *
  * Both star ops are expressed as groupBy + collect_set + explode — one
  * shuffle each, no self-join (Catalyst cannot reuse the exchange across
  * join-side aliases; see the same pattern note in [[Dedup.ngramPairs]]).
  * Every primitive is order-insensitive (set collect, array_min), so the
  * result is deterministic under any partitioning.
  */
object Components {

  /** One Large-Star round: every node u connects its strictly-larger
    * neighbors to m = min(Γ(u) ∪ {u}). Keeps connectivity, strictly
    * reduces large-id → large-id edges.
    */
  private def largeStar(e: DataFrame): DataFrame =
    e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u")).agg(collect_set(col("v")).as("ns"))
      .withColumn("m", least(array_min(col("ns")), col("u")))
      .select(col("m"),
        explode(filter(col("ns"), x => x > col("u"))).as("x"))
      .select(col("x").as("u"), col("m").as("v"))
      // no distinct(): the following small-star's collect_set dedupes
      // per node (partially map-side) — an extra global exchange here
      // would only re-do that work

  /** One Small-Star round: with edges pointed large → small, every node
    * u connects its smaller neighbors (and itself) to m = min Γ(u).
    */
  private def smallStar(e: DataFrame): DataFrame =
    e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .groupBy(col("u")).agg(collect_set(col("v")).as("ns"))
      .withColumn("m", array_min(col("ns")))
      .select(col("m"), explode(array_union(col("ns"), array(col("u")))).as("x"))
      .filter(col("x") =!= col("m"))
      .select(col("x").as("u"), col("m").as("v"))
      .distinct()

  /** Direct fixpoint test: the edge set is a DISJOINT STAR SET — every
    * source points at exactly one root and no source is itself a
    * target. Both conditions are required: sources∩targets=∅ alone
    * admits a source feeding two different roots (out-degree 2), which
    * is not yet converged and would mislabel the losing root's nodes.
    * Per Kiveris et al. (SoCC'14) the only fixpoints of the alternating
    * star contraction are disjoint star sets, so this test is exact —
    * and unlike a round-over-round signature comparison it needs NO
    * extra confirm round: convergence is visible on the round's own
    * output. Cost: one partial+final aggregation keyed by node.
    */
  private def isStarSet(e: DataFrame): Boolean = {
    val r = e.select(col("u").as("node"), lit(1L).as("s"), lit(0).as("t"))
      .union(e.select(col("v").as("node"), lit(0L).as("s"), lit(1).as("t")))
      .groupBy(col("node"))
      .agg(sum(col("s")).as("outd"), max(col("t")).as("tgt"))
      .agg(
        coalesce(max(col("outd")), lit(0L)),
        coalesce(max(when(col("outd") > 0 && col("tgt") > 0, 1).otherwise(0)),
          lit(0))).head
    r.getLong(0) <= 1L && r.getInt(1) == 0
  }

  /** Component labels for every node that appears in `edges` (columns
    * `u`, `v`; undirected, self-loops ignored). Returns (node, root)
    * rows where root = the component's minimum node id; root nodes map
    * to themselves. Nodes absent from the edge list are singletons —
    * callers left-join and coalesce to the node's own id.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    var e = edges
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .transform(Lineage.checkpoint) // truncate lineage per round (reliable via spark.graft.reliableCheckpoint)
    var round = 0
    var stable = isStarSet(e) // near-dup pair lists are often stars already
    while (!stable && round < maxRounds) {
      e = Lineage.checkpoint(smallStar(largeStar(e)))
      stable = isStarSet(e)
      round += 1
    }
    require(stable, s"connectedComponents did not converge in $maxRounds rounds")
    // At fixpoint e is a set of stars (node → component min). The min()
    // is defensive aggregation only — each node already has one parent.
    val stars = e.groupBy(col("u").as("node")).agg(min(col("v")).as("root"))
    stars.select(col("node"), col("root"))
      .union(stars.select(col("root").as("node"), col("root")).distinct())
  }

  /** Declared query: duplicate clusters of the documents table. Edges =
    * the exact n-gram-Jaccard near-dup pairs ([[Dedup.ngramPairs]],
    * threshold 0.5); every document gets a cluster_id (the cluster's
    * minimum doc_id — singletons cluster with themselves), the cluster
    * size, and an is_canonical flag (the row a dedup pipeline keeps).
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(spark, sfDir))
    val pairs = Dedup.ngramPairs(docs)
      .select(col("doc1").as("u"), col("doc2").as("v"))
    val labels = connectedComponents(pairs)
      .withColumnRenamed("node", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("root"), col("doc_id")))
      .drop("root")
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))
  }
}
