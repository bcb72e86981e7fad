package graft

import graft.ops.{Similarity, Text}
import org.apache.spark.sql.functions._

/** Round-6 operators: BM25 ranking and the in-cell exact k-NN graph. */
class NewOpsR6Spec extends SparkSpec {
  import spark.implicits._

  test("bm25Of is bit-identical to a driver-side BM25 over the fixture corpus") {
    val terms = Seq("spark", "join", "vector")
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    val local = docs.collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = local.length.toDouble
    val avgdl = local.map(_._2.length).sum.toDouble / local.length
    val dfs = terms.map(t => local.count(_._2.contains(t)).toDouble)
    def score(toks: Seq[String]): Double = {
      val dl = toks.length.toDouble
      terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.reduce(_ + _)
    }
    val expected = local.map { case (id, toks) => (id, score(toks)) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Text.bm25Of(docs, terms).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq === (1 to 20))
    got.zip(expected).foreach { case ((gid, _, gs), (eid, es)) =>
      assert(gid === eid, "rank order drifted from the local twin")
      assert(java.lang.Double.doubleToLongBits(gs) ===
        java.lang.Double.doubleToLongBits(es), s"score drift at doc $gid")
    }
    // top docs actually contain query terms (non-vacuous corpus)
    assert(expected.head._2 > 0.0)
  }

  test("knnWithinCell equals brute force per cell; neighbors never cross cells") {
    val vecs = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.9f, 0.1f, 0.0f)),
      (3L, 0, Array(0.0f, 1.0f, 0.0f)),
      (4L, 0, Array(-1.0f, 0.0f, 0.0f)),
      (5L, 1, Array(0.0f, 0.0f, 1.0f)),
      (6L, 1, Array(0.0f, 0.1f, 0.9f)),
      (7L, 1, Array(0.0f, 1.0f, 0.0f)))
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = Similarity.knnWithinCell(df, "label", k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    for ((id, _, cell, _) <- vecs.map(v => (v._1, 0, v._2, 0))) {
      val mine = out.filter(_._1 == id)
      val expect = vecs.filter(v => v._2 == cell && v._1 != id)
        .map(v => (v._1, cos(byId(id)._3, v._3)))
        .sortBy { case (nid, s) => (-s, nid) }.take(2)
      assert(mine.map(_._3).toSeq === expect.map(_._1),
        s"neighbor set mismatch for vec $id")
      mine.map(_._4).zip(expect.map(_._2)).foreach { case (g, e) =>
        assert(java.lang.Double.doubleToLongBits(g) ===
          java.lang.Double.doubleToLongBits(e))
      }
    }
    // ranks are 1..k and never reference a different cell
    assert(out.forall { case (id, r, nid, _) =>
      r >= 1 && r <= 2 && byId(id)._2 == byId(nid)._2 })
  }

  test("bm25Of property: bit-identical to the twin on random corpora, any parallelism") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("spark", "join", "vector", "table", "scan", "row",
      "agg", "key", "batch", "the", "a")
    val docGen = Gen.chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, docGen))
    val terms = Seq("spark", "join", "vector")
    var seed = Seed(13L)
    var checked = 0
    while (checked < 4) {
      corpusGen.apply(Gen.Parameters.default, seed).foreach { texts =>
        val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val n = rows.length.toDouble
        val toksOf = rows.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
        val avgdl = toksOf.values.map(_.length).sum.toDouble / n
        val dfs = terms.map(t => toksOf.values.count(_.contains(t)).toDouble)
        def score(toks: Seq[String]): Double =
          terms.zip(dfs).map { case (t, df) =>
            val tf = toks.count(_ == t).toDouble
            math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
              (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length.toDouble / avgdl))
          }.reduce(_ + _)
        val expected = rows.map { case (id, _) => (id, score(toksOf(id))) }
          .sortBy { case (id, s) => (-s, id) }.take(20)
        val saved = spark.conf.get("spark.sql.shuffle.partitions")
        try for (p <- Seq("2", "7")) {
          spark.conf.set("spark.sql.shuffle.partitions", p)
          val got = Text.bm25Of(rows.toDF("doc_id", "text"), terms).collect()
            .map(r => (r.getLong(0), r.getDouble(2)))
          assert(got.map(_._1).toSeq === expected.map(_._1),
            s"ranking drift at partitions=$p")
          got.zip(expected).foreach { case ((_, g), (_, e)) =>
            assert(java.lang.Double.doubleToLongBits(g) ===
              java.lang.Double.doubleToLongBits(e), s"score drift at partitions=$p")
          }
        } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
        checked += 1
      }
      seed = seed.next
    }
  }

  test("knnWithinCell is parallelism-invariant on the fixture") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): Seq[String] =
      Similarity.embeddingKnn(spark, sfTiny).collect().map(_.toString).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = run()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run()
      assert(a === b, "k-NN graph depends on shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("unigramNll / tokenEntropy / bigramPmi are parallelism-invariant (Det sums)") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): Seq[String] =
      (graft.ops.Text.unigramNll(spark, sfTiny).collect() ++
        graft.ops.Text.tokenEntropy(spark, sfTiny).collect() ++
        graft.ops.Text.bigramNll(spark, sfTiny).collect() ++
        graft.ops.Text.bigramPmi(spark, sfTiny).collect()).map(_.toString).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = run()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = run()
      assert(a === b, "a decimal-routed score depends on shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("unigramNll equals a driver-side twin bit-for-bit; rarity raises the score") {
    val docs = Seq(
      (1L, "the the the the"),          // most common token only
      (2L, "the zzquux"),               // contains the rarest token
      (3L, "the table scan the table")).toDF("doc_id", "text")
    val out = graft.ops.Text.unigramNllOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // driver twin: identical arithmetic incl. the DECIMAL(30,6) rounding
    val toks = Seq(1L -> Seq("the", "the", "the", "the"),
      2L -> Seq("the", "zzquux"),
      3L -> Seq("the", "table", "scan", "the", "table"))
    val all = toks.flatMap(_._2)
    val n = all.size.toDouble
    val v = all.distinct.size.toDouble
    val cnt = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    for ((id, ts) <- toks) {
      val sum = ts.map(t => dec6(-math.log((cnt(t) + 1.0) / (n + v))))
        .reduce(_ add _)
      val expect = sum.doubleValue() / ts.size
      assert(out(id)._1 === ts.size.toLong)
      assert(java.lang.Double.doubleToLongBits(out(id)._2) ===
        java.lang.Double.doubleToLongBits(expect), s"nll drift at doc $id")
    }
    // semantics: the rare-token doc scores strictly higher than the
    // common-token doc
    assert(out(2L)._2 > out(1L)._2)
  }

  test("docChunk covers every token exactly, overlaps by window-stride, tail short") {
    // window=4, stride=3: doc 1 has 10 toks -> starts 0,3,6 (ceil(6/3)+1=3
    // chunks, last covers tokens 7..10 exactly); doc 2 fits one window;
    // doc 3 is exactly one window; doc 4 (n=8) forces a short tail:
    // starts 0,3,6 with the last chunk holding just 2 tokens
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y"),
      (3L, "p q r s"),
      (4L, "t u v w a b c d")).toDF("doc_id", "text")
    val out = graft.ops.Curate.docChunk(docs, window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val expected = Seq(
      (1L, 0, 1, 4, "a b c d"), (1L, 1, 4, 4, "d e f g"),
      (1L, 2, 7, 4, "g h i j"),
      (2L, 0, 1, 2, "x y"),
      (3L, 0, 1, 4, "p q r s"),
      (4L, 0, 1, 4, "t u v w"), (4L, 1, 4, 4, "w a b c"),
      (4L, 2, 7, 2, "c d"))
    assert(out.toSeq === expected)
    // invariants on the declared query at fixture scale: chunk 0 starts at
    // token 1, consecutive starts advance by exactly the stride, the last
    // chunk reaches the end of the doc, and reassembling non-overlapped
    // prefixes reproduces the document
    val full = graft.ops.Curate.docChunkQuery(spark, sfTiny).cache()
    val byDoc = full.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .groupBy(_._1)
    val lens = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byDoc.keySet === lens.keySet)
    for ((id, chunks) <- byDoc) {
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.toSeq)
      sorted.foreach { case (_, k, start, _, _) => assert(start === k * 24 + 1) }
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN - 1 === lens(id), s"doc $id tail not covered")
      if (sorted.size > 1) assert(sorted.init.forall(_._4 === 32))
    }
    full.unpersist()
  }

  test("temperatureResample: exact md5-twin rep counts; E[copies] tracks the weight") {
    def md5hex8(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "lang")
    val local = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val out = graft.ops.Curate.domainResample(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // driver twin: identical weights, salt, and hex threshold compare
    val expected = local.flatMap { case (id, lang) =>
      val (base, thresh) = lang match {
        case "en" => (0, "80000000")
        case "zh" => (2, "80000000")
        case _    => (1, "00000000")
      }
      val reps = base + (if (md5hex8("resample:" + id) < thresh) 1 else 0)
      (0 until reps).map(r => (id, lang, r))
    }.sortBy(t => (t._1, t._3))
    assert(out.toSeq === expected.toSeq)
    // the fractional coin is actually fair-ish at fixture scale
    val en = local.filter(_._2 == "en").map(_._1).toSet
    val enKept = out.count(t => en.contains(t._1)).toDouble / en.size
    assert(enKept > 0.35 && enKept < 0.65, s"en keep rate $enKept far from 0.5")
    // whole-weight domains replicate exactly
    val zhReps = out.filter(_._2 == "zh").groupBy(_._1).map(_._2.length).toSet
    assert(zhReps.subsetOf(Set(2, 3)), s"zh copies out of range: $zhReps")
  }

  test("bigramPmiOf is bit-identical to a driver-side PMI; collocations rank top") {
    // "new york" always adjacent (planted collocation); "the" everywhere
    val docs = Seq(
      (1L, "new york is big and the city of new york is old"),
      (2L, "the new york subway and the new york harbor"),
      (3L, "the city and the harbor and the subway"),
      (4L, "big old city new york and new york again")).toDF("doc_id", "text")
    val got = graft.ops.Text.bigramPmiOf(docs, minCount = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // driver twin with the same counts and division order
    val toks = docs.collect().map(_.getString(1).trim.split("\\s+").toSeq)
    val unis = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = toks.flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = unis.values.sum.toDouble
    val nBi = bis.values.sum.toDouble
    // same Det-decimal snap as the operator (Math.log is not universally
    // libm-parity, so pmi is rounded to 6 decimals before ordering)
    def dec6(x: Double): Double =
      new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val expected = bis.filter(_._2 >= 2).map { case ((a, b), cab) =>
      val pmi = dec6(math.log((cab.toDouble / nBi) /
        ((unis(a).toDouble / nUni) * (unis(b).toDouble / nUni))))
      (a, b, cab, pmi)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(10)
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((ga, gb, gc, gp), (ea, eb, ec, ep)) =>
      assert((ga, gb, gc) === ((ea, eb, ec)))
      assert(java.lang.Double.doubleToLongBits(gp) ===
        java.lang.Double.doubleToLongBits(ep), s"pmi drift at ($ga,$gb)")
    }
    // the planted collocation beats the stopword bigrams
    assert(got.head._1 === "new" && got.head._2 === "york")
  }

  test("bigramNll equals a driver-side twin bit-for-bit; improbable order scores higher") {
    // docs 1-2 share the frequent transitions (a b), (b a); doc 3 uses
    // the same TOKENS in transitions seen nowhere else; doc 4 is too
    // short for any bigram and must be absent
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b a b"),
      (3L, "b b a a b b"),
      (4L, "a")).toDF("doc_id", "text")
    val out = graft.ops.Text.bigramNllOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(4L), "a 1-token doc has no transitions")
    // driver twin: same counts, same division order, same Det snap
    val toksOf = Map(1L -> "a b a b a b", 2L -> "a b a b", 3L -> "b b a a b b")
      .view.mapValues(_.split(" ").toSeq).toMap
    val allBis = toksOf.values.flatMap(t => t.sliding(2).map(p => (p(0), p(1)))).toSeq
    val cab = allBis.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ca = allBis.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val vb = allBis.map(_._2).distinct.size.toDouble
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    for ((id, toks) <- toksOf) {
      val bis = toks.sliding(2).map(p => (p(0), p(1))).toSeq
      val sum = bis.map { bg =>
        dec6(-math.log((cab(bg) + 1.0) / (ca(bg._1) + vb)))
      }.reduce(_ add _)
      val expect = sum.doubleValue() / bis.size
      assert(out(id)._1 === bis.size.toLong, s"n_bigrams at doc $id")
      assert(java.lang.Double.doubleToLongBits(out(id)._2) ===
        java.lang.Double.doubleToLongBits(expect), s"nll drift at doc $id")
    }
    // same tokens, unseen-elsewhere transitions -> strictly higher NLL
    assert(out(3L)._2 > out(1L)._2)
  }

  test("tokenEntropy equals a driver-side twin bit-for-bit; uniform > repetitive") {
    val docs = Seq(
      (1L, "a a a a a a"),                  // zero entropy
      (2L, "a b c d e f"),                  // maximal for n=6
      (3L, "a a b b c d")).toDF("doc_id", "text")
    val out = graft.ops.Text.tokenEntropyOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def dec6(x: Double) =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    for ((id, toks) <- Seq(1L -> Seq("a","a","a","a","a","a"),
        2L -> Seq("a","b","c","d","e","f"), 3L -> Seq("a","a","b","b","c","d"))) {
      val n = toks.size.toDouble
      val ms = toks.groupBy(identity).map(_._2.size.toDouble)
      val ent = ms.map { m =>
        val p = m / n; dec6(-(p * math.log(p)))
      }.reduce(_ add _).doubleValue()
      val (gn, gd, ge, gr) = out(id)
      assert(gn === toks.size.toLong && gd === ms.size.toLong)
      assert(java.lang.Double.doubleToLongBits(ge) ===
        java.lang.Double.doubleToLongBits(ent), s"entropy drift at doc $id")
      assert(java.lang.Double.doubleToLongBits(gr) ===
        java.lang.Double.doubleToLongBits(ms.size / n), s"ttr drift at doc $id")
    }
    assert(out(1L)._3 === 0.0)
    assert(out(2L)._3 > out(3L)._3 && out(3L)._3 > out(1L)._3)
  }

  test("docChunk property: coverage, stride, and tail hold on random docs/params") {
    val rnd = new scala.util.Random(20260813)
    for (trial <- 1 to 25) {
      val window = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(window)
      val docs = (1L to 12L).map { id =>
        val n = 1 + rnd.nextInt(40)
        (id, Seq.fill(n)("t" + rnd.nextInt(5)).mkString(" "))
      }
      val lens = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
      val out = graft.ops.Curate.docChunk(docs.toDF("doc_id", "text"), window, stride)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
        .groupBy(_._1)
      assert(out.keySet === lens.keySet, s"trial $trial lost docs")
      for ((id, chunks) <- out) {
        val sorted = chunks.sortBy(_._2)
        val n = lens(id)
        // indices contiguous from 0; starts advance by exactly stride
        assert(sorted.map(_._2).toSeq === sorted.indices.toSeq)
        sorted.foreach { case (_, k, start, nt, text) =>
          assert(start === k * stride + 1)
          assert(nt === math.min(window, n - k * stride))
          assert(text.split(" ").length === nt)
        }
        // full coverage: last chunk reaches the end; no start beyond it
        val (_, _, lastStart, lastN, _) = sorted.last
        assert(lastStart + lastN - 1 === n, s"trial $trial doc $id tail")
        assert(lastStart <= n)
        // no chunk before the last already covered the end
        if (sorted.size > 1) {
          val (_, _, prevStart, _, _) = sorted(sorted.size - 2)
          assert(prevStart + window - 1 < n, s"trial $trial doc $id overshoot")
        }
      }
    }
  }

  test("declared embedding_knn: every fixture vector gets k in-label neighbors") {
    val out = Similarity.embeddingKnn(spark, sfTiny).cache()
    val emb = Tables.embeddings(spark, sfTiny)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val perVec = rows.groupBy(_._1)
    // labels have >= 4 members in the fixture, so everyone has 3 neighbors
    assert(perVec.size === labelOf.size)
    assert(perVec.values.forall(_.map(_._2).sorted.toSeq === Seq(1, 2, 3)))
    assert(rows.forall { case (v, _, n) => labelOf(v) == labelOf(n) })
    out.unpersist()
  }
}
