package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the near-dup family on generated corpora with
  * planted duplicates and degenerate documents.
  */
class DedupPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 5)(body: T => Unit): Unit = {
    var seed = Seed(7L)
    var checked = 0
    while (checked < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => body(v); checked += 1 }
      seed = seed.next
    }
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val docGen: Gen[String] = Gen.frequency(
    6 -> Gen.choose(3, 12).flatMap(Gen.listOfN(_, word)).map(_.mkString(" ")),
    1 -> Gen.const(""),            // degenerate: empty
    1 -> Gen.const("solo"),        // degenerate: < n tokens
    1 -> Gen.const("a b"))         // degenerate: < n tokens

  test("planted exact duplicates: jaccard 1.0 in ngramPairs, hamming 0 in simhashPairs") {
    forAll(Gen.listOfN(30, docGen)) { texts =>
      // plant: duplicate the first non-degenerate doc under a new id
      val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val dupSource = base.find(_._2.trim.split("\\s+").length >= 3)
      val rows = base ++ dupSource.map { case (_, t) => (1000L, t) }.toList
      val df = rows.toDF("doc_id", "text")

      val ngram = Dedup.ngramPairs(df).collect()
      // pair sanity: strictly ordered ids, jaccard in (0, 1]
      ngram.foreach { r =>
        assert(r.getAs[Long]("doc1") < r.getAs[Long]("doc2"))
        val j = r.getAs[Double]("jaccard")
        assert(j > 0.0 && j <= 1.0)
      }
      assert(ngram.map(r => (r.getLong(0), r.getLong(1))).distinct.length === ngram.length)
      dupSource.foreach { case (id, _) =>
        val planted = ngram.find(r =>
          r.getAs[Long]("doc1") == id && r.getAs[Long]("doc2") == 1000L)
        assert(planted.isDefined, s"planted duplicate of $id not found")
        assert(planted.get.getAs[Double]("jaccard") === 1.0)
      }

      val sim = Dedup.simhashPairs(df).collect()
      dupSource.foreach { case (id, _) =>
        val planted = sim.find(r =>
          r.getAs[Long]("doc1") == id && r.getAs[Long]("doc2") == 1000L)
        assert(planted.isDefined && planted.get.getAs[Long]("hamming") === 0L)
      }
    }
  }

  test("exactDedup on generated corpora: one survivor per text, lowest id, no loss") {
    forAll(Gen.listOfN(40, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exactDedup(df, "text", "doc_id").collect()
      val byText = texts.zipWithIndex.groupBy(_._1)
      assert(out.length === byText.size)
      out.foreach { r =>
        val expectedId = byText(r.getAs[String]("text")).map(_._2).min.toLong
        assert(r.getAs[Long]("doc_id") === expectedId)
      }
    }
  }
}
