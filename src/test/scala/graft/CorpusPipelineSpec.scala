package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus pipeline end-to-end: monotone filtering, valid splits, sound packing") {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus_spec").toString
    val counts = CorpusPipeline.run(spark, sfSmall, out)
    val byStage = counts.toMap

    // every filtering stage can only shrink the corpus
    val order = counts.map(_._2)
    assert(order.head == 500)
    assert(counts.take(6).map(_._2).sliding(2).forall(p => p(1) <= p(0)),
      s"stage counts not monotone: $counts")
    // written == mixed (the write loses nothing)
    assert(byStage("07_written") == byStage("06_mixed"))
    assert(byStage("05_decontaminated") > 100) // pipeline not degenerate

    val corpus = spark.read.parquet(s"$out/corpus")
    // splits are disjoint+exhaustive by construction; all three present
    assert(corpus.select("split").distinct().as[String].collect().toSet ==
      Set("train", "val", "test"))
    // PII never reaches the written corpus
    assert(corpus.filter(col("text").rlike(graft.ops.Text.EmailPattern)).count() == 0)
    // near-dups are gone: re-running pair generation finds nothing
    val residualPairs = graft.ops.Dedup.ngramPairs(
      Tables.parallelize(corpus.select(col("doc_id"), col("text")))).count()
    assert(residualPairs == 0, s"$residualPairs near-dup pairs survived")

    // packing covers every train doc exactly once, chunks contiguous
    val packed = spark.read.parquet(s"$out/train_packing")
    assert(packed.count() == byStage("08_train"))
    val span = packed.agg(
      min(col("chunk_first")), max(col("chunk_last")), sum(col("n_tokens"))).head
    assert(span.getLong(0) == 0)
    assert(span.getLong(1) == (span.getLong(2) - 1) / 256) // last chunk = ceil(tokens/C)-1

    // documents quality battery rode the same pass (Dataset.observe —
    // no extra scan) and its verdicts land with the stage counts
    assert(byStage("10_q_empty_text") == 0, "fixture has no empty docs")
    assert(byStage("11_q_null_key") == 0)
    assert(byStage("12_q_bad_lang") == 0, "fixture langs are 2-letter tags")
    assert(byStage("13_q_min_chars") > 0)
    assert(byStage("14_q_max_chars") >= byStage("13_q_min_chars"))
    val exactLangs = Tables.documents(spark, sfSmall)
      .select("lang").distinct().count()
    assert(math.abs(byStage("15_q_lang_est") - exactLangs) <= 1,
      s"lang cardinality estimate ${byStage("15_q_lang_est")} vs $exactLangs")
  }
}
