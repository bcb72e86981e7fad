package graft

import graft.ops.{Curate, Dedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals on planted documents") {
    val df = Seq(
      (1L, "a a a a a"),            // all-duplicate tokens, one bigram
      (2L, "w x y z"),              // fully distinct
      (3L, "p")                     // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = df.select((col("doc_id") +: Curate.repetitionColumns(col("text"))): _*)
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getInt(1) == 5 && r1.getDouble(2) == 0.8)       // 4/5 dup tokens
    assert(r1.getDouble(3) == 0.75 && r1.getDouble(4) == 1.0) // "a a" ×4 → 3/4 dup, top=1
    val r2 = out(1)
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
    assert(r2.getDouble(4) == 1.0 / 3)                        // 3 distinct bigrams
    val r3 = out(2)
    assert(r3.getInt(1) == 1 && r3.getDouble(3) == 0.0 && r3.getDouble(4) == 0.0)
  }

  test("staged repetition signals equal the single-projection anchor") {
    val docs = Tables.documents(spark, sfTiny).select(col("doc_id"), col("text"))
    val anchor = docs
      .select((col("doc_id") +: Curate.repetitionColumns(col("text"))): _*)
      .orderBy("doc_id").collect().toSeq
    val staged = Curate.withRepetitionSignals(docs, col("text"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("dup_2gram_frac"), col("top_2gram_frac"))
      .orderBy("doc_id").collect().toSeq
    assert(anchor.nonEmpty && anchor == staged)
  }

  test("withRepetitionSignals refuses to clobber same-named caller columns") {
    val df = Seq((1L, "a b c", 99)).toDF("doc_id", "text", "n_tokens")
    val err = intercept[IllegalArgumentException] {
      Curate.withRepetitionSignals(df, col("text"))
    }
    assert(err.getMessage.contains("n_tokens"))
  }

  test("decontaminate: hashed grams give identical pairs to string grams") {
    val plain = Curate.decontaminate(spark, sfSmall).collect()
    val hashed = Curate.decontaminateHashed(spark, sfSmall).collect()
    assert(plain.nonEmpty)
    assert(plain.toSeq == hashed.toSeq)
  }

  test("decontaminate flags a planted benchmark copy") {
    // doc 0 is benchmark (0 % 25 == 0); doc 7 copies its text verbatim
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (0L, bench),
      (7L, bench),
      (9L, "nothing in common with anything here at all")
    ).toDF("doc_id", "text")
    val out = Curate.contaminatedPairs(df, benchMod = 25, minCommon = 4,
      hashed = false).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 0L)))
    assert(out.head.getDouble(3) == 1.0) // full overlap
  }

  test("stratifiedSample is partition-invariant and hits its rates") {
    val docs = Tables.documents(spark, sfSmall)
    def keys(parts: Int): Seq[Long] =
      Curate.stratifiedSample(docs.repartition(parts), "doc_id", "lang",
        Curate.MixRates, Curate.MixDefault)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a = keys(3)
    assert(a == keys(11)) // same decision at any parallelism
    // en downsampled to ~25% of 218, default strata ~50%
    val byLang = Curate.stratifiedSample(docs, "doc_id", "lang",
      Curate.MixRates, Curate.MixDefault)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") > 218 * 0.10 && byLang("en") < 218 * 0.40)
    assert(byLang("de") > 70 * 0.30 && byLang("de") < 70 * 0.70)
  }

  test("rateThreshold maps rates to 8-hex-digit keep bounds") {
    assert(Curate.rateThreshold(0.25) == "40000000")
    assert(Curate.rateThreshold(0.75) == "c0000000")
    assert(Curate.rateThreshold(0.0) == "00000000")
    intercept[IllegalArgumentException](Curate.rateThreshold(1.0))
  }

  test("deterministicShuffle: a reproducible permutation; salt changes it") {
    val docs = Tables.documents(spark, sfSmall)
    def order(salt: String, parts: Int): Seq[Long] =
      Curate.deterministicShuffle(docs.repartition(parts), "doc_id", salt)
        .select("doc_id").as[Long].collect().toSeq
    val a = order("shuf:", 3)
    assert(a == order("shuf:", 13))            // partition-invariant
    assert(a.sorted != a)                      // actually permuted
    assert(a.toSet == order("epoch2:", 3).toSet)
    assert(a != order("epoch2:", 3))           // new salt → new permutation
  }

  test("hashSplit: disjoint, exhaustive, stable under incremental ingest") {
    val docs = Tables.documents(spark, sfSmall)
    val split = Curate.hashSplit(docs, "doc_id")
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 500)
    assert(counts("train") > 350 && counts("train") < 450) // ~80%
    assert(counts("val") > 20 && counts("test") > 20)
    // stability: a doc's split doesn't change when computed on a subset
    // (the incremental-ingest property randomSplit lacks)
    val subset = Curate.hashSplit(docs.filter(col("doc_id") < 100), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = split.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  test("seq_pack invariants: contiguous token stream, bounded offsets") {
    val c = 256L
    val rows = Curate.seqPack(spark, sfSmall).collect()
    var cum = 0L
    rows.foreach { r =>
      val n = r.getLong(1)
      val first = r.getLong(2); val last = r.getLong(3); val off = r.getLong(4)
      assert(off == cum % c)
      assert(first == cum / c)
      assert(last == (cum + n - 1) / c)
      assert(first <= last)
      cum += n
    }
  }

  test("distributed prefix-sum packing equals the declared global window") {
    val declared = Curate.seqPack(spark, sfSmall).collect()
    val dist = Curate.packChunksDistributed(
      Tables.documents(spark, sfSmall)).collect()
    assert(declared.toSeq == dist.toSeq)
    // and at a partition count that doesn't divide the data evenly
    val dist5 = Curate.packChunksDistributed(
      Tables.documents(spark, sfSmall), partitions = 5).collect()
    assert(declared.toSeq == dist5.toSeq)
  }

  test("incrementalNew equals the plain anti-join and survives bloom fpp") {
    val docs = Tables.documents(spark, sfSmall)
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val viaBloom = Curate.incrementalNew(existing, batch, "text",
      expectedItems = 64, fpp = 0.5) // tiny+saturated filter → many false positives
      .select("doc_id").as[Long].collect().sorted.toSeq
    val plain = batch.join(existing.select("text").distinct(), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaBloom == plain)
    assert(viaBloom.nonEmpty)
  }

  test("corpus-scale Bloom sizing raises Spark's silent runtime-filter caps") {
    // Spark's BloomFilterAggregate Math.min's against the session's
    // runtime-join-filter limits (4M items / 67.1M bits) with no error;
    // a capped filter saturates and silently stops pruning. bloomOf
    // must lift the limits to the requested sizing.
    val docs = Tables.documents(spark, sfTiny).select(col("text"))
    val items = 100L * 1000 * 1000
    val wantBits = graft.functions.BloomNative.optimalNumBits(items, 0.01)
    assert(wantBits > 67108864L, "test premise: sizing must exceed the default cap")
    graft.functions.BloomNative.bloomOf(docs, col("text"), items, 0.01)
    assert(spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong >= items)
    assert(spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong >= wantBits)
  }

  test("incrementalNew drops a planted cross-batch duplicate") {
    val existing = Seq((1L, "shared duplicate content"), (2L, "old news")).toDF("doc_id", "text")
    val batch = Seq((10L, "shared duplicate content"), (11L, "genuinely new")).toDF("doc_id", "text")
    val out = Curate.incrementalNew(existing, batch, "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(11L))
  }

  test("dupSpans: planted duplicate spans counted on every holder; hashed twin identical") {
    val shared = "one two three four five six seven eight" // exactly one 8-token span
    val df = Seq(
      (1L, shared),
      (2L, s"prefix $shared"),                  // 2 spans, 1 shared with doc 1
      (3L, "a b c"),                            // < 8 tokens: no spans, no row
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),       // 2 spans, all unique
      (5L, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8") // WITHIN-doc repeat
    ).toDF("doc_id", "text")
    def rows(hashed: Boolean) = Curate.dupSpanCounts(df, hashed = hashed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = rows(hashed = false)
    // doc 5: 9 spans; positions 1 and 9 are the same span (freq 2), the
    // 7 boundary-crossing windows are unique
    assert(got == Seq((1L, 1L, 1L), (2L, 2L, 1L), (4L, 2L, 0L), (5L, 9L, 2L)))
    assert(got == rows(hashed = true))
  }

  test("stratifiedQuota: exactly n per stratum, equals the window formulation, partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sfSmall).select("doc_id", "lang")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = asSet(Curate.stratifiedQuota(docs, "doc_id", "lang", 20))
    assert(got.groupBy(_._1).forall(_._2.size == 20),
      s"per-stratum counts: ${got.groupBy(_._1).view.mapValues(_.size).toMap}")
    val window = docs
      .withColumn("skey", Curate.quotaKey(col("doc_id"), "quota:"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("skey").desc)))
      .filter(col("rn") <= 20)
    assert(got == asSet(window))
    assert(got == asSet(Curate.stratifiedQuota(docs.repartition(13), "doc_id", "lang", 20)))
  }
}
