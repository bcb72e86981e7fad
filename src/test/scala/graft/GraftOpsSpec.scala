package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** The facade must behave identically on arbitrarily-named columns. */
class GraftOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val renamed = Tables.documents(spark, sfTiny)
    .select(col("doc_id").as("url_id"), col("text").as("body"))

  test("facade dedupExact over renamed columns equals fixture-bound result") {
    val viaApi = GraftOps.dedupExact(renamed, "body", "url_id")
      .select(col("url_id")).as[Long].collect().sorted.toSeq
    val fixture = graft.ops.Dedup.dedupExact(spark, sfTiny)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(viaApi === fixture)
  }

  test("facade ngramNearDups over renamed columns equals fixture-bound result") {
    val viaApi = GraftOps.ngramNearDups(renamed, "url_id", "body")
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    val fixture = graft.ops.Dedup.dedupNgram(spark, sfTiny)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(viaApi === fixture)
  }

  test("facade textQuality/langId over renamed columns match fixture-bound queries") {
    val q = GraftOps.textQuality(renamed, "body")
      .select(col("url_id"), col("n_tokens"), col("stopword_ratio"))
      .as[(Long, Int, Double)].collect().toSet
    val fq = graft.ops.Text.textQuality(spark, sfTiny)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"))
      .as[(Long, Int, Double)].collect().toSet
    assert(q === fq)
    val l = GraftOps.langId(renamed, "body")
      .select(col("url_id"), col("predicted_lang")).as[(Long, String)].collect().toSet
    val fl = graft.ops.Text.langId(spark, sfTiny)
      .select(col("doc_id"), col("predicted_lang")).as[(Long, String)].collect().toSet
    assert(l === fl)
  }

  test("facade bpeTokenCount matches the declared token_bpe counts") {
    val viaApi = GraftOps.bpeTokenCount(renamed, "body")
      .select(col("url_id"), col("n_re_tokens")).as[(Long, Long)].collect().toSet
    val fixture = graft.ops.Text.tokenBpe(spark, sfTiny)
      .select(col("doc_id"), col("n_re_tokens")).as[(Long, Long)].collect().toSet
    assert(viaApi === fixture)
  }

  test("facade cosineTopK with a separate probe frame matches similarity_topk") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
    val viaApi = GraftOps.cosineTopK(emb, emb.filter(col("id") < 10), "id", "emb", k = 5)
      .select("probe_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    val fixture = graft.ops.Similarity.similarityTopk(spark, sfTiny)
      .select("probe_id", "rank", "cand_id").as[(Long, Int, Long)].collect().toSet
    assert(viaApi === fixture)
  }
}
