package graft.ops

import graft.Tables
import graft.functions.BpePieces
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge-table learning and application over a corpus — upgrades
  * `token_bpe`'s documented ≤4-char stand-in to a real learned
  * subword vocabulary (Sennrich et al., ACL 2016).
  *
  * Training is the classic loop: segment the corpus with the current
  * table, count adjacent piece pairs, adopt the most frequent pair as
  * the next merge. Each iteration is ONE distributed aggregation; only
  * the single winning pair (one row) returns to the driver — the
  * corpus never does. At production scale the same loop batches
  * several non-overlapping winners per round to cut iterations; the
  * one-pair loop here keeps parity with the published algorithm.
  */
object Bpe {

  /** Learn `numMerges` merges. Deterministic: ties break on the pair's
    * lexicographic order; stops early when no adjacent pair repeats.
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    var merges = Vector.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = docs
        .select(explode(BpePieces.pieces(spark, col(textCol), merges, "learn"))
          .as("tok"))
        .filter(size(col("tok")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("tok")) - 2),
          k => struct(element_at(col("tok"), k + 1).as("a"),
            element_at(col("tok"), k + 2).as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else { merges = merges :+ ((top(0).getString(0), top(0).getString(1))); i += 1 }
    }
    merges
  }

  /** Batched training — the 100 TB loop: adopt up to `batch`
    * non-conflicting winners per corpus pass instead of one, cutting
    * the number of distributed aggregations ~batch-fold. Two selected
    * pairs conflict when they share a piece string (applying both in
    * one round could then interact with each other's occurrences);
    * restricting a round to piece-disjoint pairs makes the batch
    * order-independent, so the learned table is deterministic.
    * `batch = 1` reproduces the sequential published algorithm exactly.
    */
  def learnMergesBatched(docs: DataFrame, textCol: String,
                         numMerges: Int, batch: Int = 8): Seq[(String, String)] = {
    require(batch >= 1)
    val spark = docs.sparkSession
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      // headroom: conflicts drop candidates, so over-fetch the round
      val top = docs
        .select(explode(BpePieces.pieces(spark, col(textCol), merges, "learnb"))
          .as("tok"))
        .filter(size(col("tok")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("tok")) - 2),
          k => struct(element_at(col("tok"), k + 1).as("a"),
            element_at(col("tok"), k + 2).as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(batch * 4).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        var adopted = 0
        top.foreach { r =>
          val (a, b) = (r.getString(0), r.getString(1))
          if (adopted < batch && merges.size < numMerges &&
              !used(a) && !used(b) && !used(a + b)) {
            merges = merges :+ ((a, b))
            used += a; used += b; used += (a + b)
            adopted += 1
          }
        }
        if (adopted == 0) done = true
      }
    }
    merges
  }

  /** The default table: 32 merges learned once from the sf0.001
    * documents fixture via [[learnMerges]] (regeneration guarded by
    * BpeSpec — BPE training is prefix-stable, so the spec re-learns a
    * prefix and compares). A deployment replaces this with its own
    * trained table, exactly like shipping a tokenizer's merges file.
    */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("s", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("m", "er"),
    ("a", "t"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("d", "er"),
    ("or", "der"),
    ("or", "t"),
    ("s", "ort"),
    ("par", "t"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("in", "e"))

  /** Segment with the default table and account pieces per document. */
  def tokenBpeLearned(spark: SparkSession, sfDir: String): DataFrame =
    tokenBpeLearnedOf(Tables.documents(spark, sfDir), "doc_id", "text", DefaultMerges)

  /** DataFrame-first core over caller columns. */
  def tokenBpeLearnedOf(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)]): DataFrame =
    docs
      .withColumn("_pcs",
        BpePieces.pieces(docs.sparkSession, col(textCol), merges, "apply"))
      .select(
        col(idCol),
        size(col("_pcs")).cast(LongType).as("n_re_tokens"),
        aggregate(transform(col("_pcs"), a => size(a).cast(LongType)),
          lit(0L), (acc, v) => acc + v).as("n_pieces"))
      .orderBy(col(idCol))
}
