package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("native ShingleHashes equals composed shingles+xxhash64 as a set, incl. edge inputs") {
    import org.apache.spark.sql.functions._
    val edge = Seq("", " ", "a", "a b", "a b c", "a b c d",
      "  padded   text  here  ", "x x x x x").toDF("text")
    val docs = Tables.documents(spark, sfTiny).select(col("text"))
      .unionAll(edge)
    val mismatch = docs.select(
        sort_array(graft.functions.ShingleHashes
          .shingleHashes(spark, col("text"))).as("native"),
        sort_array(array_distinct(
          transform(Dedup.shingles(col("text")), s => xxhash64(s)))).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatch === 0)
  }

  test("shingles: short and empty docs produce empty arrays, no crash") {
    val df = Seq("", "one", "one two", "one two three", "a b c d")
      .toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val sizes = df.select(size(col("sh"))).collect().map(_.getInt(0))
    assert(sizes.toSeq === Seq(0, 0, 0, 1, 2))
  }

  test("shingles are distinct n-grams in order-insensitive set semantics") {
    val sh = Seq("x y x y x y")
      .toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
      .head.getSeq[String](0)
    assert(sh.toSet === Set("x y x", "y x y"))
  }

  test("dedup_exact keeps lowest doc_id per duplicate group") {
    val docs = Seq(
      (10L, "same text here", "en", "s", 14L),
      (3L, "same text here", "en", "s", 14L),
      (7L, "unique", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("t")
    // run the same plan shape as dedupExact against the in-memory table
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("text")).orderBy(col("doc_id"))
    val out = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(3L, 7L))
  }

  test("minhash candidates achieve high recall vs exact jaccard >= 0.5 pairs") {
    val truth = Dedup.dedupNgram(spark, sfTiny, threshold = 0.5)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val cand = Dedup.dedupMinhash(spark, sfTiny)
      .as[(Long, Long)].collect().toSet
    assume(truth.nonEmpty)
    val recall = truth.intersect(cand).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall; truth=${truth.size} cand=${cand.size}")
  }

  test("simhash pairs are reflexively consistent and within hamming bound") {
    val pairs = Dedup.dedupSimhash(spark, sfTiny)
    assert(pairs.filter(col("doc1") >= col("doc2")).count() === 0)
    assert(pairs.filter(col("hamming") > 3).count() === 0)
  }

  test("fuzzyPairs equals brute-force levenshtein<=1 on all edit cases") {
    // substitution (abcd~abxd), deletion (abcd~abd), insertion
    // (abcd~abcde), and the confirm-filter case: ab~ba share deletion
    // variants ("a","b") but sit at distance 2 and must NOT pair
    val names = Seq("abcd", "abxd", "abd", "abcde", "zzzz", "ab", "ba")
    val pairs = Dedup.fuzzyPairs(names.toDF("c_name"), "c_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(pairs == brute)
    assert(brute.contains(("abcd", "abd")) && !brute.contains(("ab", "ba")))
  }

  test("fuzzyDedup degree count is even in total and positive") {
    // every undirected pair contributes 2 to the total degree
    val out = Dedup.fuzzyDedup(spark, sfTiny).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(1)).sum
    assert(total % 2 == 0 && out.forall(_.getLong(1) > 0))
  }

  test("incrementalNearPairs finds cross-boundary rewordings, never within-side pairs") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated content about spark physical plans"),
      (3L, "the quick brown fox jumps over the lazy dog today")) // dup INSIDE existing
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog yesterday"), // near-dup of 1,3
      (101L, "fresh novel text with no overlap whatsoever at all"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearPairs(existing, batch, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 100 matches BOTH existing copies; batch 101 matches nothing;
    // the existing-internal dup (1,3) is not this operator's business
    assert(got === Set((100L, 1L), (100L, 3L)))
    // jaccard sanity: 8 shared of (8+8) distinct shingles each → 8/(16-8)=...
    val j = Dedup.incrementalNearPairs(existing, batch, threshold = 0.5)
      .filter(col("e_id") === 1L).head.getDouble(3)
    assert(j > 0.5 && j < 1.0)
  }

  test("incrementalNearPairs: boilerplate batch shingles are capped and audited") {
    // every batch doc shares one header shingle (the multiplicative
    // blowup term); the only overlap with existing is that shingle
    val batch = (0 until 4)
      .map(i => (100L + i, s"common header shingle unique$i tail words here"))
      .toDF("doc_id", "text")
    val existing = Seq((1L, "common header shingle")).toDF("doc_id", "text")
    // guard below the df: the hot shingle is dropped from the broadcast,
    // so no pair survives — and the audit twin reports exactly it
    assert(Dedup.incrementalNearPairs(existing, batch,
      threshold = 0.1, maxBatchDf = 2).isEmpty)
    // two shingles span all 4 docs: "common header shingle" AND the
    // shared tail "tail words here"
    val dropped = Dedup.incrementalDropped(batch, maxBatchDf = 2).collect()
    assert(dropped.length === 2 && dropped.forall(_.getLong(1) === 4L))
    // guard above the df: all four matches come back, nothing audited
    assert(Dedup.incrementalNearPairs(existing, batch,
      threshold = 0.1, maxBatchDf = 4).count() === 4)
    assert(Dedup.incrementalDropped(batch, maxBatchDf = 4).isEmpty)
  }

  test("ngramDropped reports the df-capped hot shingles the pair path drops") {
    // 5 docs share the hot shingle "x y z"; with maxDf=4 every pair it
    // would generate is suppressed — the audit must say so
    val docs = (0 until 5).map(i => (i.toLong, s"x y z tail$i"))
      .toDF("doc_id", "text")
    val dropped = Dedup.ngramDropped(docs, maxDf = 4).collect()
    assert(dropped.length === 1 && dropped.head.getLong(1) === 5L)
    // raise the cap above the df: nothing suppressed, audit certifies it
    assert(Dedup.ngramDropped(docs, maxDf = 5).isEmpty)
  }

  test("fuzzyDropped reports the variant buckets the pair path drops whole") {
    // all four keys share deletion variant "a" → bucket of 4 keys; with
    // maxBucket=3 every distance-1 pair is suppressed (pairs empty) and
    // the audit reports exactly that bucket
    val names = Seq("ab", "ac", "ad", "ae").toDF("c_name")
    assert(Dedup.fuzzyPairs(names, "c_name", maxBucket = 3).isEmpty)
    val dropped = Dedup.fuzzyDropped(names, "c_name", maxBucket = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(dropped.toSeq === Seq(("a", 4)))
    assert(Dedup.fuzzyDropped(names, "c_name", maxBucket = 4).isEmpty)
  }

  test("semanticDropped reports exactly the clusters the pair path excludes") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val dropped = Dedup.semanticDropped(emb, cells = 10, maxCluster = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // 500 vectors over 10 cells — some cluster must exceed 20
    assert(dropped.nonEmpty && dropped.forall(_._2 > 20))
    // cap above the corpus size: nothing to report
    assert(Dedup.semanticDropped(emb, cells = 10, maxCluster = 600).isEmpty)
  }

  test("embeddingDropped reports over-cap LSH buckets; empty under a loose cap") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // cap 1: every ≥2 bucket is "dropped" — must be non-empty and sized right
    val dropped = Dedup.embeddingDropped(emb, maxBucket = 1).collect()
    assert(dropped.nonEmpty && dropped.forall(_.getLong(2) > 1))
    assert(Dedup.embeddingDropped(emb, maxBucket = 1000).isEmpty)
  }

  test("semanticPairs: planted duplicate recovered; every pair is a true pair") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0)
        .select(lit(100000L).as("vec_id"), col("v")))
    val pairs = Dedup.semanticPairs(planted, cells = 10, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // an identical clone shares the cluster of its original by
    // construction (same point, same nearest centroid) → cos 1.0 pair
    assert(pairs.exists(p => p._1 == 0L && p._2 == 100000L
      && math.abs(p._3 - 1.0) < 1e-9), "planted clone not recovered")
    // soundness: within-cluster pairs are a subset of the brute-force
    // above-threshold pair set (recall is the documented k-means trade)
    val a = planted.select(col("vec_id").as("i1"), col("v").as("v1"))
    val b = planted.select(col("vec_id").as("i2"), col("v").as("v2"))
    val brute = a.crossJoin(b).filter(col("i1") < col("i2"))
      .select(col("i1"), col("i2"),
        graft.ops.Similarity.cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall(p => brute((p._1, p._2))),
      "semantic pair not present in the exact pair set")
  }
}
