package graft.ops

import graft.{Tables, Det}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis over the `documents` table — the training-data-pipeline
  * operators (language stats, quality scoring, token counting, document
  * fingerprinting). All built from codegen'd `functions._` — no UDFs, so
  * every expression stays inside whole-stage codegen and the parquet scan
  * reads only (doc_id, text, …) columns actually referenced.
  *
  * Scale notes: everything here is embarrassingly parallel per-document
  * except the groupBy rollups, which aggregate map-side first. Token
  * counting is a regex split (no vocabulary broadcast needed).
  */
object Text {

  /** Whitespace tokenization; matches DuckDB string_split_regex. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Corpus stats per (lang, source): docs, chars, tokens, avg doc length.
    * Sums over int64 are exact; avg via exact-sum/count (see graft.Det).
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", tokenCount(col("text")).cast(LongType))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
      .orderBy(col("lang"), col("source"))

  /** Per-document quality signals (reference-free heuristics used in
    * LLM-data pipelines): length, token stats, punctuation density,
    * mean token length, stopword ratio over a small fixed list.
    * Pure per-row arithmetic — deterministic across engines.
    */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select((col("doc_id") +: col("lang") +: qualityColumns(col("text"))): _*)
      .orderBy(col("doc_id"))

  /** DataFrame-first core: the per-row quality signal columns for any
    * text column (length, token stats, punctuation density, stopword
    * ratio over a small fixed list).
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val toks = tokens(text)
    val nTok = size(toks)
    val stopHits = size(filter(toks, t => t.isin(stopwords: _*)))
    Seq(
      length(text).as("n_chars_measured"),
      nTok.as("n_tokens"),
      (length(text).cast(DoubleType) / nTok).as("avg_token_len"),
      (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
        .as("punct_chars"),
      stopHits.as("stopword_hits"),
      (stopHits.cast(DoubleType) / nTok).as("stopword_ratio"))
  }

  /** Deterministic n-gram language-ID heuristic: score each candidate
    * language by stopword evidence and character classes; emit the argmax.
    * (The fixture text is synthetic English-ish words for every `lang`
    * label — the point is the operator shape: per-row scoring against a
    * broadcast-free inline rule set, SQL-expressible for the oracle.)
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select((col("doc_id") +: col("lang").as("labeled_lang") +:
        langIdColumns(col("text"))): _*)
      .orderBy(col("doc_id"))

  /** DataFrame-first core: per-language stopword-evidence scores and the
    * argmax prediction for any text column.
    */
  def langIdColumns(text: Column): Seq[Column] = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => when(t.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _)
    val en = hits(Seq("the", "and", "of", "is"))
    val es = hits(Seq("el", "la", "de", "que"))
    val de = hits(Seq("der", "die", "und", "das"))
    Seq(
      en.as("en_score"), es.as("es_score"), de.as("de_score"),
      when(en >= es && en >= de, "en")
        .when(es >= de, "es")
        .otherwise("de").as("predicted_lang"))
  }

  /** BPE-style pre-tokenizer regex: letter runs | digit runs | single
    * non-alphanumeric glyph — the (simplified) GPT-2 pre-tokenization
    * shape. Same dialect subset compiles identically under Java regex
    * (Spark) and RE2 (DuckDB), keeping the oracle exact.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token accounting the way an LLM-ingest pipeline needs it: regex
    * pre-tokens, a subword-piece budget (≤4 chars per piece — a cheap
    * deterministic stand-in for a learned BPE merge table), and a
    * polynomial rolling-hash fingerprint over the token stream
    * (order-sensitive, unlike [[docFingerprint]]'s sorted-set hash).
    * All per-row narrow codegen'd expressions.
    */
  def tokenBpe(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit(BpePattern), lit(0))
    val pieces = aggregate(
      transform(toks, t => floor((length(t) + lit(3)) / lit(4)).cast(LongType)),
      lit(0L), (a, b) => a + b)
    // h ← (h·31 + ascii(tok[0])·131 + len(tok)) mod p, folded left to
    // right — matches DuckDB list_reduce over a 0-prepended list.
    val rolling = aggregate(
      transform(toks, t =>
        ascii(t).cast(LongType) * lit(131L) + length(t).cast(LongType)),
      lit(0L), (a, b) => (a * lit(31L) + b) % lit(1000000007L))
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_re_tokens"),
        pieces.as("n_pieces"),
        rolling.as("rolling_fp"))
      .orderBy(col("doc_id"))
  }

  /** Corpus heavy hitters via the native Misra–Gries sketch aggregate
    * ([[graft.functions.MisraGries]]): top-k tokens with count
    * estimates. Shuffles ≤ capacity counters per partition instead of
    * one row per distinct token — the scale path for frequent-n-gram
    * mining. On the fixture vocabulary (≪ capacity) the sketch incurs
    * no decrements, so counts are exact and the DuckDB oracle matches.
    */
  def heavyTokens(spark: SparkSession, sfDir: String,
                  k: Int = 10, capacity: Int = 256): DataFrame =
    Tables.parallelize(Tables.documents(spark, sfDir))
      .select(explode(tokens(col("text"))).as("tok"))
      .agg(graft.functions.MisraGries
        .heavyHitters(spark, col("tok"), k, capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.token").as("token"), col("h.est").as("occurrences"))
      .orderBy(col("occurrences").desc, col("token"))

  /** PII patterns shared by the scrub op and its oracle: written in the
    * regex subset that compiles identically under Java regex (Spark) and
    * RE2 (DuckDB) — character classes, bounded/unbounded repeats, no
    * backrefs or lookaround (RE2 has neither).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\n]+"
  val LongDigitsPattern = "[0-9]{6,}"

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before anything else sees the text: emails → `<EMAIL>`,
    * URLs → `<URL>`, long digit runs (ids, phone numbers) → `<NUM>`,
    * with per-category redaction counts for audit. Order matters and is
    * fixed: emails, then URLs, then digit runs — so digits inside an
    * already-redacted email/URL are not double-counted. Pure per-row
    * codegen'd `regexp_replace`/`regexp_count`; embarrassingly parallel,
    * no shuffle at any scale.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select((col("doc_id") +: piiScrubColumns(col("text"))): _*)
      .orderBy(col("doc_id"))

  /** DataFrame-first core: scrubbed text + per-category counts for any
    * text column.
    */
  def piiScrubColumns(text: Column): Seq[Column] = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterUrl = regexp_replace(afterEmail, UrlPattern, "<URL>")
    val clean = regexp_replace(afterUrl, LongDigitsPattern, "<NUM>")
    Seq(
      clean.as("clean_text"),
      regexp_count(text, lit(EmailPattern)).cast(LongType).as("n_emails"),
      regexp_count(afterEmail, lit(UrlPattern)).cast(LongType).as("n_urls"),
      regexp_count(afterUrl, lit(LongDigitsPattern)).cast(LongType).as("n_numbers"))
  }

  /** Quantile-based quality filtering: rank every document by its
    * stopword-ratio quality signal and keep those above the `dropBelow`
    * percentile — the "drop the worst X% of the corpus" gate standard in
    * LLM-data curation. Exact corpus-wide percent_rank over a total
    * order (score, doc_id), so the result is deterministic and
    * SQL-expressible for the oracle.
    *
    * Scale note: a global percent_rank is a single-partition window —
    * fine to define semantics, wrong to run on 100 TB. This method is
    * the SEMANTICS ANCHOR the specs cross-check; the DECLARED/benched
    * path is [[qualityFilterDist]] (exact, distributed — same output,
    * same oracle) and [[qualityFilterApprox]] is the sketch-cutoff
    * variant for pipelines that don't need the rank column.
    */
  def qualityFilter(spark: SparkSession, sfDir: String,
                    dropBelow: Double = 0.2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"), col("doc_id"))
    scored(Tables.documents(spark, sfDir))
      .withColumn("q_rank", percent_rank().over(w))
      .filter(col("q_rank") >= dropBelow)
      .select(col("doc_id"), col("lang"), col("score"), col("q_rank"))
      .orderBy(col("doc_id"))
  }

  /** DECLARED/benched variant: the exact global percent_rank computed
    * DISTRIBUTED — range-partition by (score, doc_id), per-partition
    * row_number in parallel windows, lift to a global rank via the
    * per-partition counts ([[graft.ops.Prefix]] two-phase prefix sum).
    * Identical output to [[qualityFilter]] (the oracle SQL is shared),
    * but no single-partition window: the plan you'd run at 100 TB when
    * the q_rank column itself is needed.
    */
  def qualityFilterDist(spark: SparkSession, sfDir: String,
                        dropBelow: Double = 0.2,
                        partitions: Int = 0): DataFrame = {
    val (ranked, n) = Prefix.withOffsets(
      scored(Tables.documents(spark, sfDir)),
      Seq(col("score"), col("doc_id")), lit(1L), partitions)
    // (score, doc_id) is a total order, so rank == row_number and
    // percent_rank = (rank - 1) / (n - 1); n<=1 → rank 0 by definition
    val denom = math.max(n - 1, 1L).toDouble
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("score"), col("doc_id"))
    ranked
      .withColumn("q_rank",
        (col("_offset") + row_number().over(wp) - 1).cast(DoubleType) / denom)
      .filter(col("q_rank") >= dropBelow)
      .select(col("doc_id"), col("lang"), col("score"), col("q_rank"))
      .orderBy(col("doc_id"))
  }

  /** The cutoff-only 100 TB variant: percentile cutoff from a
    * fixed-size sketch (one aggregation), then an embarrassingly
    * -parallel filter. No global window, no sort — cheapest when the
    * rank column is not needed downstream.
    */
  def qualityFilterApprox(docs: DataFrame, dropBelow: Double = 0.2,
                          accuracy: Int = 10000): DataFrame = {
    val s = scored(docs)
    val cutoff = s.agg(
      percentile_approx(col("score"), lit(dropBelow), lit(accuracy))).head.getDouble(0)
    s.filter(col("score") >= cutoff)
  }

  /** Stopword-ratio quality score per document (shared by both filter
    * variants).
    */
  private def scored(docs: DataFrame): DataFrame = {
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), col("lang"),
      (size(filter(toks, t => t.isin(stopwords: _*))).cast(DoubleType) /
        size(toks)).as("score"))
  }

  /** TF-IDF-style distinctive-term extraction: the top-k terms per
    * document ranked by document-frequency-normalized term frequency
    * (tf/df) — the keyword-extraction pass corpus tooling runs for
    * topic tagging and quality triage. The score is the RATIONAL
    * normalization rather than a log idf on purpose: `ln` differs in
    * the last ulp across libm implementations, which would break the
    * bit-exact oracle hash, and the ranking it induces here is the
    * same "frequent in this doc, rare in the corpus" order.
    *
    * Plan shape: one explode pass → (doc, token) partial+final count →
    * df via a count window keyed by token (NOT a self-join back onto
    * the tf aggregate, which would evaluate the explode twice) → per
    * -doc top-k window. Three key-partitioned shuffles, each on a key
    * with corpus-scale cardinality — no single-partition stage.
    */
  def termRelevance(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    termRelevanceOf(Tables.documents(spark, sfDir), k)

  /** DataFrame-first core over (doc_id, text) rows. */
  def termRelevanceOf(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .withColumn("score", col("tf").cast(DoubleType) / col("df"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** BM25 ranking (Robertson/Spärck Jones, k1=1.2 b=0.75) of the corpus
    * against a fixed term set — the retrieval scorer a curation pipeline
    * uses for query-based decontamination and targeted quality slices.
    *
    * Determinism: tf/df/dl/N are exact integers; avgdl is one double
    * division of exact integers; idf is `ln` of an identical double on
    * both engines and the per-term partial scores sum in FIXED term
    * order — every float op is a same-input IEEE op, so the score is
    * bit-reproducible at any parallelism and DuckDB-recomputable
    * (unlike a float AGGREGATION, whose order varies; this is the same
    * argument as [[graft.ops.Similarity.projectSigns]]' fold).
    *
    * Plan shape: one explode → groupBy(doc) with map-side partial agg
    * (token rows never cross the wire: conditional sums collapse to one
    * row per doc per mapper), corpus stats as one broadcast scalar row,
    * then a narrow per-row score projection and a single top-N. The
    * corpus is scanned once; no token-level shuffle, no driver data.
    */
  def bm25Of(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
             b: Double = 0.75, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty, "bm25Of: need at least one query term")
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"),
        explode_outer(col("ts")).as("token"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(first(col("dl")).as("dl"), tfCols: _*)
    val statCols = Seq(
      count(lit(1)).as("n"), sum(col("dl")).as("sdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val avgdl = col("sdl").cast(DoubleType) / col("n")
    // fixed left-to-right term order — the oracle sums the same order
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast(DoubleType)
      val dfT = col(s"df$i").cast(DoubleType)
      // graft_ln, not builtin ln: Spark's Log is StrictMath (fdlibm),
      // 1 ulp off libm/DuckDB on some inputs — see functions.MathLn
      val idf = graft.functions.MathLn.ln(SparkSession.active, lit(1.0) +
        (col("n").cast(DoubleType) - dfT + lit(0.5)) / (dfT + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / avgdl))
    }.reduce(_ + _)
    // top-N FIRST via sort+limit (TakeOrderedAndProject: per-partition
    // heaps, no corpus-cardinality single-partition window), then rank
    // the <= topN survivors — the bounded-rows window is scale-free
    val top = scored.select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank"), col("score"))
      .orderBy(col("rank"))
  }

  /** Declared query: BM25 top-20 for a 3-term query over the fixture
    * corpus.
    */
  def bm25Rank(spark: SparkSession, sfDir: String): DataFrame =
    bm25Of(Tables.documents(spark, sfDir), Seq("spark", "join", "vector"))

  /** Unigram language-model negative log-likelihood per document — the
    * perplexity-filter proxy an LLM curation pipeline scores with
    * (CCNet / Gopher style: docs whose tokens are improbable under the
    * corpus distribution are boilerplate, gibberish, or wrong-language).
    * Laplace-smoothed over the corpus's own vocabulary:
    * p(t) = (count_t + 1) / (N + V), score = Σ −ln p(t) / n_tokens.
    *
    * Determinism: counts/N/V are exact integers; p is the same rational
    * on both engines; −ln p goes through [[graft.functions.MathLn]]
    * (libm parity — builtin ln is fdlibm, 1 ulp off); and the per-doc
    * SUM routes each −ln p through an exact DECIMAL(30,6) — the [[Det]]
    * discipline — because a float sum's accumulation order varies with
    * partitioning while decimal addition is exact and order-free.
    *
    * Plan shape: ONE corpus scan. Occurrences shrink to (doc, token)
    * multiplicity pairs first — the partial agg gets map-side combine,
    * so the shuffle carries distinct pairs, never every occurrence.
    * Corpus totals (N, V) come from a global agg over the SAME pair
    * aggregate, whose exchange Spark dedups (`ReusedExchange`) — no
    * second scan, no probs-table join-back. Per-token corpus counts via
    * a sum-window on the pair rows (state per token = docs containing
    * it, the [[Curate.dupSpanCounts]] pattern). The per-doc sum routes
    * dec6(nll)·m through DECIMAL — decimal × integer is exact, so this
    * equals the per-occurrence decimal sum bit-for-bit.
    */
  def unigramNllOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = SparkSession.active
    val pairs = docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("m"))
    val scalars = pairs.agg(
      sum(col("m")).as("n_total"),
      count_distinct(col("token")).as("v_size"))
    val withP = pairs
      .withColumn("c", sum(col("m")).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(scalars))
      .withColumn("nll", negate(graft.functions.MathLn.ln(spark,
        (col("c").cast(DoubleType) + lit(1.0)) /
          (col("n_total").cast(DoubleType) + col("v_size").cast(DoubleType)))))
    withP.groupBy(col("doc_id"))
      .agg(
        sum(col("m")).as("n_tokens"),
        (sum(col("nll").cast(Det.Dec) * col("m")).cast(DoubleType) /
          sum(col("m"))).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Declared query: unigram NLL over the fixture corpus. */
  def unigramNll(spark: SparkSession, sfDir: String): DataFrame =
    unigramNllOf(Tables.documents(spark, sfDir))

  /** Bigram-LM average negative log-likelihood per document — the
    * CONDITIONAL upgrade of [[unigramNllOf]]: a doc full of common
    * tokens in improbable ORDER (shuffled text, keyword stuffing)
    * scores high here while the unigram filter passes it. Laplace-
    * smoothed conditional over the corpus's own transitions:
    * p(b|a) = (c(a,b) + 1) / (c(a·) + V_b), where c(a,b) is the corpus
    * count of the adjacent bigram, c(a·) the count of bigrams starting
    * with `a`, and V_b the number of distinct second tokens — the
    * outcome space of the conditional, so every quantity derives from
    * ONE bigram pair table. Docs with fewer than 2 tokens have no
    * transitions and are absent from the output (same on both engines).
    *
    * Determinism: integer counts → identical rationals; −ln through
    * [[graft.functions.MathLn]] snapped per-term to the [[graft.Det]]
    * grid before the m-weighted decimal sum (the bigram_pmi lesson —
    * ln is not cross-engine bit-stable).
    *
    * Plan shape: ONE corpus scan. Occurrences collapse to
    * (doc, a, b, m) pairs map-side; corpus c(a,b) and c(a·) via
    * sum-windows over the pair rows (keyed on (a,b) and (a)); V_b
    * aggregates the SAME pair exchange (AQE `ReusedExchange`, as in
    * [[unigramNllOf]]); one per-doc partial+final agg.
    */
  def bigramNllOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = SparkSession.active
    val toks = col("_toks")
    val pairs = docs.withColumn("_toks", tokens(col("text")))
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("a"),
            element_at(toks, i + 1).as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("m"))
    // m >= 1 always, so this is count_distinct(b) — but referencing m
    // keeps column pruning from collapsing this branch into a separate
    // distinct-only corpus scan, so it shares (ReusedExchange) the pair
    // exchange with the window branch: ONE corpus scan, as documented
    val scalars = pairs.agg(
      count_distinct(when(col("m") >= 1, col("b"))).as("v_b"))
    val w = pairs
      .withColumn("c_ab",
        sum(col("m")).over(Window.partitionBy(col("a"), col("b"))))
      .withColumn("c_a", sum(col("m")).over(Window.partitionBy(col("a"))))
      .crossJoin(broadcast(scalars))
      .withColumn("nll", negate(graft.functions.MathLn.ln(spark,
        (col("c_ab").cast(DoubleType) + lit(1.0)) /
          (col("c_a").cast(DoubleType) + col("v_b").cast(DoubleType))))
        .cast(Det.Dec))
    w.groupBy(col("doc_id"))
      .agg(
        sum(col("m")).as("n_bigrams"),
        (sum(col("nll") * col("m")).cast(DoubleType) / sum(col("m")))
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Declared query: bigram NLL over the fixture corpus. */
  def bigramNll(spark: SparkSession, sfDir: String): DataFrame =
    bigramNllOf(Tables.documents(spark, sfDir))

  /** Per-document token-distribution statistics: Shannon entropy of the
    * doc's OWN token distribution (low entropy = repetitive boilerplate
    * or single-token spam; high = lexically diverse) and the type-token
    * ratio — the information-theoretic quality pair next to the Gopher
    * repetition fractions ([[Curate.repetitionColumns]] measures
    * specific patterns; entropy measures the whole distribution).
    *
    * entropy = Σ_t −(m_t/n)·ln(m_t/n), over the doc's distinct tokens.
    *
    * Determinism: m and n are exact integers, each term's IEEE
    * arithmetic is per-row (bit-stable given the same rational), each
    * term snaps to the [[graft.Det]] DECIMAL(30,6) grid before the
    * per-doc sum (ln is not cross-engine bit-stable — the bigram_pmi
    * lesson — and decimal addition is order-free, so the sum survives
    * any partitioning).
    *
    * Plan shape: occurrences collapse to (doc, token, m) pairs map-side
    * (the [[unigramNllOf]] discipline — distinct pairs on the wire,
    * never occurrences); n via a sum-window keyed on doc_id over the
    * pair rows; one per-doc partial+final agg. Two keyed shuffles.
    */
  def tokenEntropyOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = SparkSession.active
    val pairs = docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("m"))
    val withN = pairs
      .withColumn("n", sum(col("m")).over(Window.partitionBy(col("doc_id"))))
    val p = col("m").cast(DoubleType) / col("n").cast(DoubleType)
    withN
      .withColumn("term",
        negate(p * graft.functions.MathLn.ln(spark, p)).cast(Det.Dec))
      .groupBy(col("doc_id"))
      .agg(
        max(col("n")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(col("term")).cast(DoubleType).as("entropy"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
        col("entropy"),
        (col("distinct_tokens").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("type_token_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Declared query: token entropy over the fixture corpus. */
  def tokenEntropy(spark: SparkSession, sfDir: String): DataFrame =
    tokenEntropyOf(Tables.documents(spark, sfDir))

  /** Top PMI collocations: adjacent-bigram pointwise mutual information
    * over the corpus — pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with
    * p(a,b) from bigram counts and p(·) from unigram counts (Church &
    * Hanks 1990). The standard phrase-mining / tokenizer-vocabulary
    * signal: bigrams that co-occur far above chance are units ("new
    * york") and survive; incidental neighbors score ≈ 0.
    *
    * Determinism: all counts are exact integers and the pmi ratio is
    * evaluated in the same division order on both engines (per-row IEEE
    * is bit-stable), but `Math.log` is NOT universally libm-parity —
    * measured 1 ulp above glibc at arg 1.2816829596764632 (BM25's
    * inputs never hit such a case; PMI's did). So the score is snapped
    * to the [[graft.Det]] DECIMAL(30,6) grid before ordering and
    * output: a 1-ulp input difference rounds identically on both
    * engines, and the top-k boundary breaks (rounded) pmi ties by
    * (a, b).
    *
    * Plan shape: two corpus passes BY DESIGN (the [[vocabOov]]
    * precedent) — bigram and unigram tables each shrink via
    * map-side-combined partial aggs, so both shuffles carry distinct
    * keys, never occurrences; a pos-tagged single-pass variant would
    * instead shuffle every token occurrence on doc_id for the lead()
    * window. Corpus totals reuse their aggregate's exchange (AQE
    * `ReusedExchange`, as in [[unigramNllOf]]); the unigram table
    * joins by its key on both sides of the bigram (keyed shuffles —
    * broadcast would cap vocabulary size); top-k plans as
    * `TakeOrderedAndProject`, never a global sort.
    */
  def bigramPmiOf(docs: DataFrame, minCount: Long = 5, k: Int = 100)
      : DataFrame = {
    val spark = SparkSession.active
    val toks = col("_toks")
    val bi = docs.withColumn("_toks", tokens(col("text")))
      .filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("a"),
          element_at(toks, i + 1).as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val uni = docs
      .select(explode_outer(tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val nBi = bi.agg(sum(col("c_ab")).as("n_bi"))
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val joined = bi.filter(col("c_ab") >= minCount)
      .join(uni.select(col("token").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("token").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(nBi)).crossJoin(broadcast(nUni))
    joined
      .select(col("a"), col("b"), col("c_ab"),
        graft.functions.MathLn.ln(spark,
          (col("c_ab").cast(DoubleType) / col("n_bi").cast(DoubleType)) /
            ((col("c_a").cast(DoubleType) / col("n_uni").cast(DoubleType)) *
              (col("c_b").cast(DoubleType) / col("n_uni").cast(DoubleType))))
          .cast(graft.Det.Dec).cast(DoubleType).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Declared query: collocations with ≥5 occurrences, top 100 by PMI. */
  def bigramPmi(spark: SparkSession, sfDir: String): DataFrame =
    bigramPmiOf(Tables.documents(spark, sfDir))

  /** Content fingerprint: md5 of the exact text plus a coarse structural
    * fingerprint (md5 of the sorted distinct token set) that survives
    * token reordering. md5 is identical across engines → oracle-exact.
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(col("text")).as("content_fp"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
          .as("shingle_fp"))
      .orderBy(col("doc_id"))

  /** Vocabulary coverage / out-of-vocabulary rate: build the top-V
    * corpus vocabulary by token frequency (ties broken by token text —
    * fully deterministic) and score every document by the fraction of
    * its tokens OUTSIDE that vocabulary. The standard tokenizer-fit /
    * gibberish signal a curation pipeline computes before committing
    * to a vocab size (high OOV → boilerplate, code, or wrong-language
    * text relative to the corpus core).
    *
    * Two corpus passes BY DESIGN (at 100 TB vocab building is its own
    * job): pass 1 = token partial+final count → global top-V via
    * `TakeOrderedAndProject` (per-partition heaps, only V rows merge on
    * the driver — never a full sort); pass 2 = re-explode and probe the
    * BROADCAST vocabulary with a left join, then one per-doc rollup.
    * The vocab is V rows regardless of corpus size; the big sides only
    * ever shuffle on doc_id.
    */
  def vocabOovOf(docs: DataFrame, vocabSize: Int = 20): DataFrame = {
    def toks(df: DataFrame) = df
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
    val vocab = toks(docs)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    toks(docs)
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, lit(1))).as("oov_tokens"))
      .withColumn("oov_frac",
        col("oov_tokens").cast(DoubleType) / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  def vocabOov(spark: SparkSession, sfDir: String): DataFrame =
    vocabOovOf(Tables.parallelize(Tables.documents(spark, sfDir)))
}
