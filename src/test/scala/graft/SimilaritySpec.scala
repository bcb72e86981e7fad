package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val sim = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0) === 0.0)
  }

  test("similarity_topk: k results per probe, descending sim, no self-match") {
    val df = Similarity.similarityTopk(spark, sfTiny, numProbes = 5, k = 3).cache()
    assert(df.count() === 15)
    assert(df.filter(col("probe_id") === col("cand_id")).count() === 0)
    val perProbe = df.groupBy("probe_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 3).count()
    assert(perProbe === 0)
    // rank 1 has the max sim within each probe
    val bad = df.groupBy("probe_id")
      .agg(max(col("sim")).as("mx"))
      .join(df.filter(col("rank") === 1), "probe_id")
      .filter(col("sim") =!= col("mx")).count()
    assert(bad === 0)
    df.unpersist()
  }

  test("ann_lsh results are a subset-quality approximation of brute force") {
    val exact = Similarity.similarityTopk(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annLsh(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    // every ANN pair shares the probe's bucket; sanity: non-empty and
    // no self pairs
    assert(approx.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"ANN recall@5 = $recall (${approx.size} approx pairs)")
    // HARD floor. Context for the number: this fixture is isotropic-
    // random (5th-NN cos ≈ 0.29, per-bit agreement p ≈ 0.6) — the
    // degenerate regime where ANY sublinear ANN has low recall by
    // information-theoretic necessity; expected P(collide, Hamming ≤ 1
    // of 6 bits) ≈ 0.23 per true neighbor, measured 0.2. The operative
    // recall gate is the planted-structure test below; this floor
    // catches the signature/bucketing math silently breaking (recall
    // was 0.0 with 8 planes / multiProbe=3 before round 5 re-tuned the
    // default fan-out).
    assert(recall >= 0.12, s"fixture LSH recall collapsed: $recall")
  }

  test("planted near-neighbor structure: LSH and kmeans-IVF recall@5 hard floors") {
    // The fixture is isotropic noise — real corpora are not. Plant, for
    // each probe, 5 deterministic perturbed twins at cos ≈ 0.97 (the
    // regime ANN indexes exist for: genuine near-duplicates). The exact
    // top-5 of each probe is then its planted set, so recall@5 is exact
    // and fully deterministic (seeded noise) — a hard floor that fails
    // loudly if the signature math, bucketing join, or quantizer
    // train/assign path regresses.
    val base = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val nProbes = 10
    val perProbe = 5
    val probeVecs = base.filter(col("vec_id") < nProbes)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val rnd = new scala.util.Random(42)
    val planted: Seq[(Long, Seq[Double])] = for {
      (pid, pv) <- probeVecs.toSeq
      j <- 0 until perProbe
    } yield {
      val d = pv.length
      val noisy = pv.map(x => x + 0.25 * rnd.nextGaussian() / math.sqrt(d.toDouble))
      val n = math.sqrt(noisy.map(x => x * x).sum)
      (100000L + pid * 100 + j, noisy.map(_ / n))
    }
    val corpus = base.unionByName(planted.toDF("vec_id", "v"))
    val truth: Set[(Long, Long)] = planted.map { case (id, _) =>
      ((id - 100000L) / 100, id)
    }.toSet
    // sanity: the planted twins really are the exact top-5 (brute force)
    val all = corpus.as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exactTop: Set[(Long, Long)] = probeVecs.flatMap { case (pid, pv) =>
      all.filter(_._1 != pid).map { case (cid, cv) => (cid, cos(pv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(perProbe)
        .map { case (cid, _) => (pid, cid) }
    }.toSet
    assert(exactTop === truth, "planted twins are not the exact top-5 — fixture broken")

    val lsh = Similarity.lshSearch(corpus, numProbes = nProbes, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val lshRecall = truth.intersect(lsh).size.toDouble / truth.size
    info(s"planted LSH recall@5 = $lshRecall")
    assert(lshRecall >= 0.8, s"LSH planted recall@5 $lshRecall < 0.8")

    val ivf = Similarity.ivfKmeansSearch(corpus, cells = 10, numProbes = nProbes, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivfRecall = truth.intersect(ivf).size.toDouble / truth.size
    info(s"planted kmeans-IVF recall@5 = $ivfRecall")
    assert(ivfRecall >= 0.8, s"kmeans-IVF planted recall@5 $ivfRecall < 0.8")

    // the int8-residual index must not lose recall vs the float IVF:
    // reconstruction error is <= half a quantization step per dim,
    // far below the planted cos≈0.97 separation
    val rq = Similarity.ivfRqSearch(corpus, cells = 10, numProbes = nProbes, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val rqRecall = truth.intersect(rq).size.toDouble / truth.size
    info(s"planted IVF-RQ recall@5 = $rqRecall")
    assert(rqRecall >= 0.8, s"IVF-RQ planted recall@5 $rqRecall < 0.8")
  }

  test("similarity_ivf_rq: ADC scores track exact cosine within quantization error; deterministic across parallelism") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val out = Similarity.ivfRqSearch(emb, cells = 8, numProbes = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.length === 50)
    // driver-side exact cosines for the returned pairs
    val vecs = emb.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val worst = out.map { case (p, c, sim) =>
      math.abs(sim - cos(vecs(p), vecs(c)))
    }.max
    info(s"worst |ADC sim - exact cos| = $worst")
    // 64 dims, per-dim residual error <= w/2 with w = range/255: the
    // dot-product error bound is sqrt(64)*w/2 ~ 0.01 on this fixture;
    // 0.05 catches a broken dequantizer without flaking on geometry
    assert(worst <= 0.05, s"ADC reconstruction error too large: $worst")

    // deterministic by construction at any parallelism — same rows,
    // same float bits, under a different shuffle layout
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val again =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        Similarity.ivfRqSearch(emb, cells = 8, numProbes = 10, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert(again.toSeq === out.toSeq, "IVF-RQ output varies with shuffle parallelism")
  }

  test("similarity_ivf: candidates come only from the probe's nprobe cells; recall measurable") {
    val ivf = Similarity.annIvf(spark, sfTiny, numProbes = 10, k = 5).cache()
    assert(ivf.count() === 50)
    assert(ivf.filter(col("probe_id") === col("cand_id")).count() === 0)
    val exact = Similarity.similarityTopk(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = ivf.select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(s"IVF recall@5 (nprobe=2/10 cells) = $recall")
    // HARD floor. The label cells carry no geometric structure on this
    // fixture (labels are metric-random), so nprobe=2 of 10 cells scans
    // ~20% of the corpus and expected recall sits near 0.2-0.3; the
    // planted-structure test carries the trustworthiness gate. This
    // floor catches the cell-probe join or centroid math breaking.
    assert(recall >= 0.2, s"fixture IVF recall collapsed: $recall")
    ivf.unpersist()
  }

  test("dedup_embedding: every returned pair truly exceeds the cosine threshold; decent recall") {
    import graft.ops.Dedup
    val thr = 0.4
    val got = Dedup.dedupEmbedding(spark, sfTiny, threshold = thr)
      .select("vec1", "vec2", "cos").as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // exact truth by brute force on the tiny corpus
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = emb.select(col("vec_id").as("vec1"), col("v").as("v1"))
    val b = emb.select(col("vec_id").as("vec2"), col("v").as("v2"))
    val truth = a.join(b, col("vec1") < col("vec2"))
      .select(col("vec1"), col("vec2"), Similarity.cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= thr)
      .select("vec1", "vec2").as[(Long, Long)].collect().toSet
    // precision must be exact (every emitted pair re-ranked with true cosine)
    got.foreach { case (v1, v2, c) =>
      assert(c >= thr && truth.contains((v1, v2)))
    }
    val recall = got.map(p => (p._1, p._2)).toSet.size.toDouble / truth.size
    info(s"embedding near-dup recall @cos>=$thr = $recall (${got.length}/${truth.size})")
    assert(recall >= 0.2)
  }

  test("kmeans-quantized IVF: k results per probe from trained cells") {
    val ivf = Similarity.annIvfKmeans(spark, sfTiny, cells = 8).cache()
    assert(ivf.count() === 50)
    assert(ivf.filter(col("probe_id") === col("cand_id")).count() === 0)
    val exact = Similarity.similarityTopk(spark, sfTiny, numProbes = 10, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = ivf.select("probe_id", "cand_id").as[(Long, Long)].collect().toSet
    info(s"kmeans-IVF recall@5 = ${exact.intersect(approx).size.toDouble / exact.size}")
    ivf.unpersist()
  }

  test("native CosineSim equals the composed-builtin cosine bit-for-bit") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("i"), col("v").as("va"))
    val b = emb.filter(col("vec_id") >= 40 && col("vec_id") < 80)
      .select(col("vec_id").as("j"), col("v").as("vb"))
    val mismatch = a.crossJoin(b)
      .select(Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineComposed(col("va"), col("vb")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatch === 0)
  }

  test("native HyperplaneSig equals the composed-builtin signature bit-for-bit") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val mismatch = emb.select(
        Similarity.lshSignature(col("v"), 6, 12).as("native"),
        Similarity.lshSignatureComposed(col("v"), 6, 12).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatch === 0)
  }

  test("embedding centroids match a driver-side per-dimension mean") {
    val rows = Tables.embeddings(spark, sfTiny)
      .select(col("label"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    val dims = rows.head._2.length
    val expected = rows.groupBy(_._1).map { case (label, vs) =>
      label -> (0 until dims).map { i =>
        vs.map(v => BigDecimal(v._2(i).toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.length
      }
    }
    val got = Similarity.embeddingCentroids(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got.size === expected.size * dims)
    expected.foreach { case (label, means) =>
      means.zipWithIndex.foreach { case (m, i) =>
        val (c, n) = got((label, i))
        assert(n === rows.count(_._1 == label).toLong)
        assert(math.abs(c - m) < 1e-9, s"label=$label dim=$i")
      }
    }
  }

  test("embeddings are unit-norm (fixture invariant the ops rely on)") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val offUnit = emb.select(Similarity.norm(col("v")).as("n"))
      .filter(abs(col("n") - 1.0) > 1e-3).count()
    assert(offUnit === 0)
  }
}
