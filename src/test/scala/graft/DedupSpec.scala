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
}
