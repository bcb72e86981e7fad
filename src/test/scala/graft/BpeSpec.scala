package graft

import graft.ops.Bpe
import graft.functions.BpePieces
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side reference BPE (same greedy lowest-rank
    * rule, written differently).
    */
  private def refSegment(tok: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var pieces = tok.map(_.toString).toList
    var go = true
    while (go && pieces.size > 1) {
      val ranked = pieces.zip(pieces.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (ranked.isEmpty) go = false
      else {
        val (_, i) = ranked.minBy(_._1)
        pieces = pieces.take(i) ++ List(pieces(i) + pieces(i + 1)) ++ pieces.drop(i + 2)
      }
    }
    pieces
  }

  private def refPieces(text: String, merges: Seq[(String, String)]): Seq[Seq[String]] =
    graft.ops.Text.BpePattern.r.findAllIn(text).map(refSegment(_, merges)).toSeq

  test("BpePieces equals the reference segmentation on fixture + edge inputs") {
    val edge = Seq("", "a", "aaaa", "scan scan scan", "x1y2z3 !!!", "  ", "value value")
    val texts = Tables.documents(spark, sfTiny).select("text")
      .as[String].collect().take(50).toSeq ++ edge
    val got = texts.toDF("text")
      .select(col("text"),
        BpePieces.pieces(spark, col("text"), Bpe.DefaultMerges, "spec"))
      .as[(String, Seq[Seq[String]])].collect().toMap
    texts.foreach { t =>
      assert(got(t) === refPieces(t, Bpe.DefaultMerges), s"text: '$t'")
    }
  }

  test("training is prefix-stable: re-learning the first 8 merges reproduces DefaultMerges") {
    val relearned = Bpe.learnMerges(
      Tables.documents(spark, sfTiny), "text", numMerges = 8)
    assert(relearned === Bpe.DefaultMerges.take(8))
  }

  test("batched training with batch=1 reproduces the sequential algorithm") {
    val docs = Tables.documents(spark, sfTiny)
    val seq6 = Bpe.learnMerges(docs, "text", numMerges = 6)
    val bat1 = Bpe.learnMergesBatched(docs, "text", numMerges = 6, batch = 1)
    assert(bat1 === seq6)
  }

  test("batched training rounds are piece-disjoint and compress comparably") {
    val docs = Tables.documents(spark, sfTiny)
    val merges = Bpe.learnMergesBatched(docs, "text", numMerges = 12, batch = 4)
    assert(merges.size === 12)
    // adjacent groups of ≤4 adopted per round share no piece strings
    merges.grouped(4).foreach { round =>
      val pieces = round.flatMap { case (a, b) => Seq(a, b, a + b) }
      assert(pieces.distinct.size === pieces.size, s"conflicting round: $round")
    }
    def total(ms: Seq[(String, String)], tag: String): Long =
      docs.select(aggregate(
          transform(graft.functions.BpePieces.pieces(spark, col("text"), ms, tag),
            a => size(a).cast("long")),
          lit(0L), (acc, v) => acc + v).as("n"))
        .agg(sum("n")).head.getLong(0)
    val seqTotal = total(Bpe.DefaultMerges.take(12), "cmpseq")
    val batTotal = total(merges, "cmpbat")
    // batched table compresses within 5% of the sequential one
    assert(batTotal <= (seqTotal * 1.05).toLong, s"bat=$batTotal seq=$seqTotal")
  }

  test("more merges monotonically shrink the piece count; zero merges = character count") {
    val docs = Tables.documents(spark, sfTiny)
    def totalPieces(merges: Seq[(String, String)], tag: String): Long =
      docs.select(aggregate(
          transform(BpePieces.pieces(spark, col("text"), merges, tag),
            a => size(a).cast("long")),
          lit(0L), (acc, v) => acc + v).as("n"))
        .agg(sum("n")).head.getLong(0)
    val chars = totalPieces(Nil, "m0")
    val p8 = totalPieces(Bpe.DefaultMerges.take(8), "m8")
    val p32 = totalPieces(Bpe.DefaultMerges, "m32")
    assert(chars > p8 && p8 > p32, s"$chars > $p8 > $p32 expected")
    // zero-merge segmentation is exactly the per-pretoken char count
    val charCount = docs.select(
        aggregate(transform(
          regexp_extract_all(col("text"), lit(graft.ops.Text.BpePattern), lit(0)),
          t => length(t).cast("long")), lit(0L), (a, b) => a + b).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(chars === charCount)
  }

  test("token_bpe_learned declared query: sane bounds and determinism") {
    val a = Bpe.tokenBpeLearned(spark, sfTiny).collect()
    val b = Bpe.tokenBpeLearned(spark, sfTiny).collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), // pieces >= pretokens
        s"doc ${r.getLong(0)}: pieces < pretokens")
    }
  }
}
