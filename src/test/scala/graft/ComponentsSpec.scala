package graft

import graft.ops.{Components, Dedup}
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find — the brute-force reference the distributed
    * alternating-star result must match exactly.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("connectedComponents on a chain (label propagation's worst case)") {
    // 0-1-2-…-63: diameter 63; star contraction must still converge in
    // O(log n) rounds (maxRounds default 25 would fail a linear scheme)
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(chain)
    assert(got.keySet === (0L to 63L).toSet)
    assert(got.values.toSet === Set(0L))
  }

  test("connectedComponents on degenerate inputs: empty set, only self-loops, one pair") {
    assert(ccOf(Seq.empty) === Map.empty)
    assert(ccOf(Seq((7L, 7L))) === Map.empty) // self-loops carry no connectivity
    assert(ccOf(Seq((9L, 4L))) === Map(9L -> 4L, 4L -> 4L))
  }

  test("connectedComponents equals union-find on assorted shapes") {
    val edges: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),          // triangle
      (10L, 11L),                            // pair
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L), // clique + tail
      (30L, 40L), (40L, 35L), (35L, 50L),    // unordered ids
      (60L, 60L)                             // self-loop: ignored
    )
    val got = ccOf(edges)
    val want = unionFind(edges.filter(e => e._1 != e._2))
    assert(got === want)
  }

  test("star test does not stop early on a source feeding two roots") {
    // (10,1),(20,1),(10,2): sources {10,20} and targets {1,2} are
    // disjoint, yet node 10 points at two roots — NOT a disjoint star
    // set (1 and 2 share a component via 10). A convergence test of
    // "no source is a target" alone would stop here and label 2 as its
    // own root; the out-degree condition must force another round.
    val got = ccOf(Seq((10L, 1L), (20L, 1L), (10L, 2L)))
    assert(got === Map(10L -> 1L, 20L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("connectedComponents equals union-find on pseudo-random graphs") {
    // deterministic LCG — no external randomness in tests
    var s = 12345L
    def next(mod: Int): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.abs(s % mod).toLong }
    for (trial <- 0 until 5) {
      val n = 40 + trial * 17
      val edges = (0 until n).map(_ => (next(50), next(50))).filter(e => e._1 != e._2)
      val got = ccOf(edges)
      val want = unionFind(edges)
      assert(got === want, s"trial $trial")
    }
  }

  test("dedup_clusters: clusters agree with union-find over ngram pairs; canonical flags consistent") {
    val pairs = Dedup.dedupNgram(spark, sfSmall)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSeq
    val want = unionFind(pairs)
    val got = Components.dedupClusters(spark, sfSmall)
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.length === Tables.documents(spark, sfSmall).count())
    // paired docs carry the union-find root; unpaired docs are singletons
    got.foreach { case (id, cl, sz, canon) =>
      assert(cl === want.getOrElse(id, id), s"doc $id")
      assert(canon === (id == cl))
      if (!want.contains(id)) assert(sz === 1L)
    }
    // every cluster's canonical row exists and is the minimum member
    val members = got.groupBy(_._2)
    members.foreach { case (cl, ms) =>
      assert(ms.map(_._1).min === cl)
      assert(ms.forall(_._3 == ms.length.toLong))
    }
    // the sf0.01 fixture has real duplicate content to cluster
    assert(members.exists(_._2.length >= 3), "expected a transitive cluster")
  }
}
