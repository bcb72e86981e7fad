package graft

import graft.ops.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("heavy_tokens sketch is exact when vocab fits capacity, and keeps the MG guarantee under eviction") {
    import graft.ops.Text
    import graft.functions.MisraGries
    // exact regime: fixture vocab << capacity → counts match groupBy
    val sketch = Text.heavyTokens(spark, sfTiny, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.documents(spark, sfTiny)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.toSeq === exact.toSeq)

    // eviction regime: 10k distinct singletons + 3 hot values, tiny
    // capacity — every value with freq > n/(capacity+1) must survive
    import spark.implicits._
    val hot = Seq.fill(3000)("alpha") ++ Seq.fill(2000)("beta") ++ Seq.fill(1500)("gamma")
    val noise = (0 until 10000).map(i => s"noise_$i")
    val df = spark.sparkContext.parallelize(
      scala.util.Random.shuffle(hot ++ noise), 8).toDF("tok")
    val hh = df.agg(MisraGries.heavyHitters(spark, col("tok"), 3, 16).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.token")).collect().map(_.getString(0)).toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(hh),
      s"heavy values lost under eviction: $hh")
  }

  test("tokenCount on edge inputs") {
    val df = Seq("a b c", "  padded  ", "single", "a  b").toDF("text")
    val counts = df.select(Text.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq === Seq(3, 1, 1, 2))
  }

  test("text_quality ratios are bounded") {
    val df = Text.textQuality(spark, sfTiny)
    assert(df.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(df.filter(col("punct_chars") < 0).count() === 0)
    assert(df.filter(col("n_tokens") <= 0).count() === 0)
  }

  test("text_stats docs sum to table size") {
    val df = Text.textStats(spark, sfTiny)
    val total = df.agg(sum(col("docs"))).head.getLong(0)
    assert(total === Tables.documents(spark, sfTiny).count())
  }

  test("doc_fingerprint: identical text => identical fingerprint") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("lang_id predicted label is one of the rule set") {
    val df = Text.langId(spark, sfTiny)
    assert(df.filter(!col("predicted_lang").isin("en", "es", "de")).count() === 0)
  }
}
