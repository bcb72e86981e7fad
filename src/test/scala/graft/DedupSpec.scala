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
}
