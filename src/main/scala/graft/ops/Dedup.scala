package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deduplication family over `documents` — exact, n-gram Jaccard,
  * MinHash+LSH banding, SimHash. The LLM-data-pipeline north star
  * (BASELINE.json), designed shuffle-first for 100 TB:
  *
  *  - exact dedup: one shuffle on the content key (or its md5 — constant
  *    width regardless of document size).
  *  - near-dup: never an O(n²) cross join. Candidate generation goes
  *    through an inverted index (explode on shingle / band key / simhash
  *    block), so the self-join is per-posting-list. Hot keys (a shingle
  *    shared by millions of docs) are the skew risk — capped via
  *    document-frequency pruning before the join.
  */
object Dedup {

  /** Exact dedup, first-writer-wins: keep the lowest doc_id per distinct
    * text. row_number over a hash-partitioned window — a single shuffle
    * on the dedup key. At 100 TB the window key becomes md5(text)
    * (constant-width shuffle rows); doc_id ordering keeps it deterministic.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Word 3-gram shingles of a text column (distinct). */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = split(trim(c), "\\s+")
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard similarity ≥ threshold.
    *
    * Plan shape (the 100 TB-safe one):
    *   docs → explode(shingles)           [narrow]
    *        → df-prune hot shingles       [one small agg]
    *        → self-join on shingle        [shuffle on shingle, posting
    *                                       lists only — no cross join]
    *        → count common per pair       [shuffle on (doc1,doc2)]
    *        → jaccard = common/(n1+n2-common), filter ≥ t.
    *
    * Document-frequency pruning bounds the worst posting list: a shingle
    * appearing in > maxDf docs generates O(maxDf²) pairs at most.
    */
  def dedupNgram(spark: SparkSession, sfDir: String,
                 threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val posting = docs
      .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    // One shuffle: gather each shingle's (small, df-capped) posting list,
    // then expand i<j pairs inside the row — no window, no self-join.
    // sort_array orders by doc_id, so pair order gives doc1 < doc2.
    val lists = posting
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("lst"))
      .filter(size(col("lst")) >= 2 && size(col("lst")) <= maxDf)
    val pairs = lists.select(explode(
      flatten(transform(col("lst"), (x, i) =>
        transform(slice(col("lst"), i + lit(2), size(col("lst"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
    pairs
      .select(
        col("p.a.doc_id").as("doc1"), col("p.b.doc_id").as("doc2"),
        col("p.a.n_sh").as("n1"), col("p.b.n_sh").as("n2"))
      .groupBy(col("doc1"), col("doc2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast(DoubleType) /
          (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("common"), col("jaccard"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** MinHash signature + LSH banding candidate pairs.
    *
    * numHashes independent min-hashes from xxhash64(shingle, seed) —
    * computed inside the exploded posting aggregation (one shuffle),
    * then grouped into bands; a pair collides if any band matches.
    * Engine-native hash → deterministic within Spark, not
    * SQL-oracle-expressible (declared rows-only per SURVEY §2b).
    *
    * At scale: signatures are numHashes×8 bytes/doc regardless of doc
    * size; band join shuffles on (band_idx, band_hash) — the classic
    * LSH layout. Seeds fixed for reproducibility.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 16): DataFrame = {
    val posting = docs
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
    val mins: Seq[Column] = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i")
    }
    posting.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  def dedupMinhash(spark: SparkSession, sfDir: String,
                   numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(Tables.documents(spark, sfDir), numHashes)
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = banded.select(col("doc_id").as("doc1"), col("band"), col("bh"))
    val b = banded.select(col("doc_id").as("doc2"), col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"))
      .distinct()
      .orderBy(col("doc1"), col("doc2"))
  }

  /** 64-bit SimHash per document: per-token xxhash64, sum ±1 votes per
    * bit, sign → bit. Near-dups = pairs within Hamming distance
    * `maxHamming`, found by exploding the signature into 4×16-bit blocks
    * (pigeonhole: distance ≤3 ⇒ at least one identical block) and
    * joining on block equality — again no cross join.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val th = transform(toks, t => xxhash64(t))
    val bitVotes: Seq[Column] = (0 until 64).map { bit =>
      aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
    }
    val sig = (0 until 64).map { bit =>
      when(bitVotes(bit) > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    docs.select(col("doc_id"), sig.as("simhash"))
  }

  def dedupSimhash(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(Tables.documents(spark, sfDir))
    val blocks: Seq[Column] = (0 until 4).map { blk =>
      struct(lit(blk).as("blk"),
        shiftright(col("simhash"), blk * 16).bitwiseAND(0xFFFFL).as("bv"))
    }
    val exploded = sig
      .select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.bv").as("bv"))
    val a = exploded.select(col("doc_id").as("doc1"), col("simhash").as("s1"), col("blk"), col("bv"))
    val b = exploded.select(col("doc_id").as("doc2"), col("simhash").as("s2"), col("blk"), col("bv"))
    a.join(b, Seq("blk", "bv"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc1"), col("doc2"))
  }
}
