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

  test("pii_scrub redacts planted emails, urls, and digit runs in order") {
    val planted = Seq(
      (1L, "contact me at jane.doe+x@corp.example.com or on 5551234567 now"),
      (2L, "see https://example.com/a?id=123456789 and http://x.io/y"),
      (3L, "card 4111111111111111 pin 9876 short 12345 ok"),
      (4L, "clean text with no pii at all"),
      (5L, "mail a@b.co via https://a@b.co/path?q=999999"))
      .toDF("doc_id", "text")
    val got = planted
      .select((col("doc_id") +: Text.piiScrubColumns(col("text"))): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L)._1 === "contact me at <EMAIL> or on <NUM> now")
    assert(got(1L)._2 === 1L && got(1L)._3 === 0L && got(1L)._4 === 1L)
    assert(got(2L)._1 === "see <URL> and <URL>")
    // the url's digits are redacted inside <URL>, not counted again
    assert(got(2L)._3 === 2L && got(2L)._4 === 0L)
    assert(got(3L)._1 === "card <NUM> pin 9876 short 12345 ok") // {6,}: short runs stay
    assert(got(3L)._4 === 1L)
    assert(got(4L) === (("clean text with no pii at all", 0L, 0L, 0L)))
    // email inside the url is scrubbed first (fixed category order);
    // the remaining scheme://<EMAIL>/… then collapses under the url pass
    assert(got(5L)._1 === "mail <EMAIL> via <URL>")
    assert(got(5L)._2 === 2L && got(5L)._3 === 1L && got(5L)._4 === 0L)
  }

  test("quality_filter keeps exactly the top (1-dropBelow) of the corpus, worst scores dropped") {
    val all = Tables.documents(spark, sfTiny).count()
    val kept = Text.qualityFilter(spark, sfTiny, dropBelow = 0.2)
    // percent_rank >= 0.2 keeps ~80%, exact count depends on rank layout
    val k = kept.count()
    assert(k < all && k >= (all * 0.75).toLong)
    // no kept document scores worse than any dropped document
    val minKept = kept.agg(min(col("score"))).head.getDouble(0)
    val dropped = Tables.documents(spark, sfTiny)
      .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(dropped.count() === all - k)
    val maxDroppedRow = Text.qualityFilter(spark, sfTiny, dropBelow = 0.0)
      .join(dropped.select("doc_id"), Seq("doc_id"), "left_semi")
      .agg(max(col("score"))).head
    assert(maxDroppedRow.getDouble(0) <= minKept)
  }

  test("termRelevance equals a driver-side recompute of df-normalized top-3") {
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tfMap = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").map(tok => (id, tok))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfMap = tfMap.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tfMap.keys.groupBy(_._1).flatMap { case (id, keys) =>
      keys.toSeq
        .map { case (_, tok) =>
          (id, tok, tfMap((id, tok)), dfMap(tok),
            tfMap((id, tok)).toDouble / dfMap(tok))
        }
        .sortBy { case (_, tok, _, _, score) => (-score, tok) }
        .take(3).zipWithIndex
        .map { case ((i, tok, tf, df, score), r) => (i, r + 1, tok, tf, df, score) }
    }.toSet
    val got = graft.ops.Text.termRelevance(spark, sfTiny)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSet
    assert(got === expected)
  }

  test("qualityFilterDist (declared) row-for-row equals the single-partition anchor") {
    val anchor = Text.qualityFilter(spark, sfTiny, dropBelow = 0.2)
    val dist = Text.qualityFilterDist(spark, sfTiny, dropBelow = 0.2)
    assert(dist.schema.fieldNames === anchor.schema.fieldNames)
    assert(dist.exceptAll(anchor).isEmpty && anchor.exceptAll(dist).isEmpty)
    // and at a parallelism the fixture doesn't default to
    val dist3 = Text.qualityFilterDist(spark, sfTiny, dropBelow = 0.2,
      partitions = 3)
    assert(dist3.exceptAll(anchor).isEmpty && anchor.exceptAll(dist3).isEmpty)
  }

  test("qualityFilterApprox agrees with the exact filter away from the cutoff boundary") {
    val docs = Tables.documents(spark, sfTiny)
    val exact = Text.qualityFilter(spark, sfTiny, dropBelow = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val approx = Text.qualityFilterApprox(docs, dropBelow = 0.2)
      .select("doc_id").as[Long].collect().toSet
    // same decision except possibly AT the cutoff score (sketch boundary)
    val diff = exact.diff(approx) ++ approx.diff(exact)
    val cutoffScores = Text.qualityFilter(spark, sfTiny, dropBelow = 0.0)
      .filter(col("doc_id").isInCollection(if (diff.isEmpty) Seq(-1L) else diff.toSeq))
      .select("score").as[Double].collect().toSet
    assert(cutoffScores.size <= 1, s"approx/exact diverge beyond one boundary score: $cutoffScores")
  }
}
